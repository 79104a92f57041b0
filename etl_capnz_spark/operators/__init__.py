"""Dataflow operators (SURVEY.md §2) — geometry, extraction, feature fan-out,
plus the large-scale extension operators (dedup, similarity, text analysis,
multimodal)."""
