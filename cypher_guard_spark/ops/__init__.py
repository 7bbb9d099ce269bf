"""Training-data operations: dedup, similarity search, text analysis,
multimodal plumbing — first-class operators for 100 TB-scale corpus prep."""
