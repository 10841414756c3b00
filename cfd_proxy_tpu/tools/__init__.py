"""Offline CLI tools: mesh partitioning, golden-file dump/check."""
