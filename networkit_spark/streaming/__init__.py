"""Structured-Streaming surface: GraphEvent replay onto edge snapshots and
windowed event aggregation."""
