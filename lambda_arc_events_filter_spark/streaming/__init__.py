"""Streaming operator library: the Tier A pipeline + windowed/stateful ops."""
