"""Extension operators beyond the reference surface (SURVEY.md §2.3):
dedup, similarity search, text analysis, multimodal binary columns."""
