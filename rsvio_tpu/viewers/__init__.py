"""Visualization: rerun SDK viewer when available, no-op fallback otherwise."""

from .base import NullViewer, Viewer, create_viewer, get_feature_color

__all__ = ["Viewer", "NullViewer", "create_viewer", "get_feature_color"]
