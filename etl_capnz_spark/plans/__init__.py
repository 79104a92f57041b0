"""End-to-end pipeline assembly (the engine's library API)."""
