"""Visualization: rerun SDK viewer when available, artifact-file viewer for
headless runs, no-op fallback otherwise."""

from .artifacts import ArtifactViewer
from .base import NullViewer, Viewer, create_viewer, get_feature_color

__all__ = ["Viewer", "NullViewer", "ArtifactViewer", "create_viewer",
           "get_feature_color"]
