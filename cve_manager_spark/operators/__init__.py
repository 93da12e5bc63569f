"""Engine operators beyond stock DataFrame calls (SURVEY §2.8):
dedup family, vector similarity, text analysis, multimodal plumbing,
and the NVD flattener."""
