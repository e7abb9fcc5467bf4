"""Composite operators (dedup, similarity, text, as-of, multimodal)."""
