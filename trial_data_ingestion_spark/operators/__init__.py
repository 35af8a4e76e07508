"""Distributed operators: chunking, dedup, similarity, text analysis."""
