"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing (engine additions beyond the
reference's operator set — first-class per the build brief)."""
