"""Multimodal (image/audio/video) column plumbing."""
