"""Operator library: windowed aggregation, joins, dedup, similarity,
text analysis, multimodal plumbing. Each module composes built-in
DataFrame ops; Pandas UDFs appear only where built-ins genuinely
cannot express the semantics."""
