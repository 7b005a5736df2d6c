"""Persistence: versioned index checkpoints (faiss_save/faiss_load analogue)."""
