"""Engine operators: extraction, canonicalization, multimodal linking,
retrieval, and training-data pipeline stages."""
