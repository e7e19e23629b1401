"""Scalar/vectorized functions: tokenizer, norm codec, posting codec, BM25."""
