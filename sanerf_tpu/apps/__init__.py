"""Application layer: CLI, interactive viewer, label tooling, batch drivers."""
