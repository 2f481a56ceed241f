"""LLM-data-pipeline operators (north-star extensions, SURVEY.md §7
step 6): deduplication, similarity search, text analysis, multimodal
columns — all designed partition-parallel (no driver-side loops, no
global sorts on big data)."""
