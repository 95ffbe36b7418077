"""Data ingest: SED2012 parsing, modality featurization, synthetic streams."""
