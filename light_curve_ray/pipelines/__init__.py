"""End-to-end pipelines + driver-facing query registry."""
