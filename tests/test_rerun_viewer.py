"""RerunViewer tests against a stub rerun SDK: verifies the reference entity
schema (stereo/left, pose_current, map/points, trajectory/path — ref
src/estimator/estimator.rs:272-364), the ~30 fps synthetic clock and
sequence timeline (ref src/viewers/rerun.rs:343-354), the 300 m point filter
(ref rerun.rs:298-306), JPEG image compression, and connection-loss
degradation to no-op (ref rerun.rs:186-190) — the SDK itself is absent in
this environment, so a recording fake is injected into sys.modules."""

import sys
import types

import numpy as np
import pytest


class _Recorder:
    def __init__(self):
        self.calls = []          # (method, args) tuples
        self.raise_on_log = False

    # --- module-level API the viewer touches ---
    def init(self, app_id, spawn=True):
        self.calls.append(("init", app_id, spawn))

    def log(self, path, obj, static=False):
        if self.raise_on_log:
            raise ConnectionError("viewer went away")
        self.calls.append(("log", path, obj))

    def set_time_sequence(self, name, value):
        self.calls.append(("set_time_sequence", name, value))

    def set_time_seconds(self, name, value):
        self.calls.append(("set_time_seconds", name, value))

    def logged_paths(self):
        return [c[1] for c in self.calls if c[0] == "log"]


def _make_stub(recorder):
    rr = types.ModuleType("rerun")
    rr.init = recorder.init
    rr.log = recorder.log
    rr.set_time_sequence = recorder.set_time_sequence
    rr.set_time_seconds = recorder.set_time_seconds

    class ViewCoordinates:
        RDF = "RDF"

    class _Archetype:
        def __init__(self, *a, **k):
            self.args = a
            self.kwargs = k

    class Image(_Archetype):
        def __init__(self, data, **k):
            super().__init__(data, **k)
            self.data = data
            self.compressed = None

        def compress(self, jpeg_quality=75):
            self.compressed = jpeg_quality
            return self

    rr.ViewCoordinates = ViewCoordinates
    rr.Arrows3D = _Archetype
    rr.Image = Image
    rr.Points2D = _Archetype
    rr.Points3D = _Archetype
    rr.Transform3D = _Archetype
    rr.Quaternion = _Archetype
    rr.Pinhole = _Archetype
    rr.LineStrips3D = _Archetype
    rr.DepthImage = _Archetype
    return rr


@pytest.fixture()
def viewer_and_recorder(monkeypatch):
    rec = _Recorder()
    monkeypatch.setitem(sys.modules, "rerun", _make_stub(rec))
    from rsvio_tpu.viewers.rerun_viewer import RerunViewer
    v = RerunViewer(spawn=False)
    assert v.initialize()
    return v, rec


class TestRerunViewer:
    def test_init_logs_rdf_and_origin(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        assert rec.calls[0] == ("init", "rsvio_tpu", False)
        paths = rec.logged_paths()
        assert paths[0] == "/"       # RDF view coordinates
        assert paths[1] == "origin"  # axes arrows

    def test_entity_schema_and_clock(self, viewer_and_recorder):
        """Drive the viewer the way the player loop does and check the
        reference entity paths + synthetic clock."""
        v, rec = viewer_and_recorder
        img = np.zeros((6, 8), np.float32)
        v.set_frame(3)
        v.log_image_with_features("stereo/left", img,
                                  np.array([[1.0, 2.0]]), [7])
        v.log_image_raw("stereo/right", img)
        v.log_pose("pose_current", np.eye(4))
        v.log_points_colored("map/points", np.array([[0, 0, 5.0]]), [7])
        v.log_trajectory("trajectory/path", np.zeros((4, 3)))
        v.log_camera_frustum("pose_current/frustum", np.eye(4),
                             [100, 100, 4, 3], (8, 6))
        paths = rec.logged_paths()
        for want in ["stereo/left", "stereo/left/features", "stereo/right",
                     "pose_current", "map/points", "trajectory/path",
                     "pose_current/frustum"]:
            assert want in paths, f"missing entity {want}: {paths}"
        # ~30 fps synthetic clock at frame 3 (ref rerun.rs:343-354)
        assert ("set_time_sequence", "frame", 3) in rec.calls
        ts = [c for c in rec.calls if c[0] == "set_time_seconds"][0]
        assert abs(ts[2] - 3 * 0.0333) < 1e-9

    def test_images_are_jpeg_compressed(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        v.log_image_raw("stereo/left", np.full((4, 4), 300.0))  # clips to 255
        obj = [c[2] for c in rec.calls if c[0] == "log"][-1]
        assert obj.compressed == 75
        assert obj.data.dtype == np.uint8 and obj.data.max() == 255

    def test_point_distance_filter(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        pts = np.array([[0, 0, 5.0], [0, 0, 400.0]])  # 2nd beyond 300 m
        v.log_points("map/points", pts)
        obj = [c[2] for c in rec.calls if c[0] == "log"][-1]
        assert obj.args[0].shape == (1, 3)

    def test_connection_loss_degrades_to_noop(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        rec.raise_on_log = True
        v.log_pose("pose_current", np.eye(4))   # raises inside -> disables
        rec.raise_on_log = False
        n = len(rec.calls)
        v.log_pose("pose_current", np.eye(4))   # now a no-op
        v.log_trajectory("trajectory/path", np.zeros((2, 3)))
        assert len(rec.calls) == n

    def test_create_viewer_falls_back_without_sdk(self, monkeypatch):
        monkeypatch.setitem(sys.modules, "rerun", None)
        from rsvio_tpu.viewers.base import NullViewer, create_viewer
        v = create_viewer("rerun")
        # Must degrade to a working no-op viewer, never raise.
        v.initialize()
        v.log_pose("pose_current", np.eye(4))
        assert isinstance(v, NullViewer) or not v._initialized


class TestFTDebugSurface:
    """Feature-tracker debug logging (ref feature_tracker/src/viewer.rs:6-97):
    labeled points at pixel centers, pyramid levels with draw order, float
    maps as DepthImage."""

    def test_labeled_points_pixel_center_offset(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        v.log_labeled_points("ft/pts", np.array([[3.0, 7.0]]), ["42"])
        (_, path, obj), = [c for c in rec.calls
                           if c[0] == "log" and c[1] == "ft/pts"]
        np.testing.assert_allclose(obj.args[0], [[3.5, 7.5]])
        assert obj.kwargs["labels"] == ["42"]

    def test_pyramid_levels_draw_order(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        pyr = [np.zeros((16, 16)), np.zeros((8, 8)), np.zeros((4, 4))]
        v.log_pyramid("ft/pyr", pyr)
        logged = [(c[1], c[2]) for c in rec.calls if c[0] == "log"
                  and c[1].startswith("ft/pyr/level_")]
        assert [p for p, _ in logged] == ["ft/pyr/level_0", "ft/pyr/level_1",
                                          "ft/pyr/level_2"]
        # Coarser level on top (higher draw order), all JPEG-compressed.
        orders = [o.kwargs["draw_order"] for _, o in logged]
        assert orders == [0.0, 1.0, 2.0]
        assert all(o.compressed == 75 for _, o in logged)

    def test_float_map_is_depth_image(self, viewer_and_recorder):
        v, rec = viewer_and_recorder
        v.log_float_map("ft/score", np.random.rand(8, 8))
        (_, path, obj), = [c for c in rec.calls
                           if c[0] == "log" and c[1] == "ft/score"]
        assert obj.args[0].dtype == np.float32
        # Missing colormap support must NOT degrade the viewer.
        assert v._initialized


class TestCapabilityProbe:
    """SDK-drift hardening: initialize() runs a construction probe of every
    rerun symbol/keyword used; an incompatible SDK disables the viewer
    LOUDLY at startup instead of silently no-op-ing mid-run."""

    def test_probe_passes_on_compatible_stub(self, monkeypatch):
        rec = _Recorder()
        rr = _make_stub(rec)
        from rsvio_tpu.viewers.rerun_viewer import probe_capabilities
        assert probe_capabilities(rr) == []

    def test_probe_names_missing_capability(self, monkeypatch):
        rec = _Recorder()
        rr = _make_stub(rec)
        del rr.LineStrips3D
        from rsvio_tpu.viewers.rerun_viewer import probe_capabilities
        missing = probe_capabilities(rr)
        assert len(missing) == 1 and missing[0].startswith("LineStrips3D")

    def test_incompatible_sdk_disables_viewer(self, monkeypatch, caplog):
        import logging
        rec = _Recorder()
        rr = _make_stub(rec)

        class BadPoints3D:  # signature drift: rejects the radii kwarg
            def __init__(self, pts, colors=None):
                pass

        rr.Points3D = BadPoints3D
        monkeypatch.setitem(sys.modules, "rerun", rr)
        from rsvio_tpu.viewers.rerun_viewer import RerunViewer
        v = RerunViewer(spawn=False)
        with caplog.at_level(logging.WARNING):
            assert not v.initialize()
        assert any("Points3D" in r.message for r in caplog.records)
        # ...and nothing was ever logged to the SDK.
        assert rec.calls == []
