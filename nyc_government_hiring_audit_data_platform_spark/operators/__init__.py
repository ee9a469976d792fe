"""Operator library: relational wrappers (SURVEY.md §2.2-2.8), fuzzy
similarity joins (§2.3), and the training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal)."""
