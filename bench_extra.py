"""Extra (non-frozen) benchmarks — isolation runs cited in
OPTIMIZATION_r06.md.  The frozen measurement protocol lives in
bench.py and is untouched; this file exists so optimization evidence
can be measured without editing it (guide §1.4).

Modes (first CLI arg):

* ``dist-queries`` — the nine bench queries FORCED through the
  distributed plans (``LOCAL_MAX_POSTINGS = 0``) against the bench's
  cached sf index: isolates the executor decode kernels from the
  driver-local serving tier.  Used to A/B the vectorized
  ``_decode_frame_postings`` executor lift against the per-block loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def dist_queries() -> None:
    sys.path.insert(0, REPO)
    import bench as B

    from emailindexer_spark import get_spark
    from emailindexer_spark.config import SERVING_CONF
    from emailindexer_spark.plans.planner import SearchEngine

    sf = B.sf_of(SF_DIR)
    n_turns = max(1000, int(6_000_000 * sf))
    ix_dir = os.path.join(REPO, ".cache", f"bench_ix_{n_turns}")
    if not os.path.isdir(ix_dir):
        raise SystemExit(f"no cached bench index at {ix_dir} — run bench.py first")
    subs = B.pick_terms(B.corpus_path(n_turns))

    spark = get_spark(
        app_name="bench-extra-dist",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf=SERVING_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, ix_dir)
    eng.LOCAL_MAX_POSTINGS = 0  # force every query onto the distributed plan
    qsec: dict[str, float] = {}
    for name, q, k, mode, wand in B.BENCH_QUERIES:
        for pat, sub in subs.items():
            q = q.replace(pat, sub)
        eng.search(q, k=k, mode=mode, use_wand=wand).collect()  # warm
        t0 = time.time()
        eng.search(q, k=k, mode=mode, use_wand=wand).collect()
        qsec[name] = round(time.time() - t0, 3)
    print(json.dumps({"mode": "dist-queries", "sf": sf, "queries": qsec}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "dist-queries"
    if mode == "dist-queries":
        dist_queries()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
