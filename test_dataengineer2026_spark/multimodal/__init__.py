"""Multimodal (binary) column support: opaque image/audio/video payloads
with typed metadata, processed via Arrow-batched Pandas UDFs."""
