"""DataFrame operators: docID assignment, filters, relational search,
dedup/similarity/quality, multimodal plumbing."""
