"""PlaybackController state machine (ref FrameContext semantics,
src/datasets/mod.rs:30-50: step_mode / auto_play / advance_frame)."""

from rsvio_tpu.cli.playback import PlaybackController


def keys(seq):
    """Key source replaying a fixed sequence, then None forever."""
    it = iter(seq)

    def source(timeout):
        return next(it, None)

    return source


class TestPlaybackController:
    def test_non_step_mode_always_advances(self):
        pc = PlaybackController(step_mode=False, key_source=keys([]))
        assert all(pc.wait_for_advance() for _ in range(5))

    def test_step_mode_waits_for_enter(self):
        trace = []

        def source(timeout):
            trace.append(timeout)
            return "\n" if len(trace) >= 3 else None

        pc = PlaybackController(step_mode=True, key_source=source)
        assert pc.wait_for_advance()
        assert len(trace) == 3  # polled until the key arrived

    def test_quit_stops_playback(self):
        pc = PlaybackController(step_mode=True, key_source=keys(["q"]))
        assert not pc.wait_for_advance()
        assert pc.quit

    def test_autoplay_toggle_flows_frames(self):
        # 'a' enables auto-play: subsequent frames advance without keys.
        pc = PlaybackController(step_mode=True, key_source=keys(["a"]))
        assert pc.wait_for_advance()
        assert pc.auto_play
        assert all(pc.wait_for_advance() for _ in range(5))

    def test_autoplay_toggle_back_to_stepping(self):
        pc = PlaybackController(
            step_mode=True, key_source=keys(["a", "a", "\n", "q"]))
        assert pc.wait_for_advance()      # 'a' -> auto-play on, advance
        assert pc.wait_for_advance()      # 'a' polled -> auto-play back OFF
        assert not pc.auto_play
        assert pc.wait_for_advance()      # stepping again: enter advances
        assert not pc.wait_for_advance()  # 'q' quits
        assert pc.quit

    def test_quit_respected_during_autoplay(self):
        pc = PlaybackController(step_mode=True, key_source=keys(["a", "q"]))
        assert pc.wait_for_advance()
        assert not pc.wait_for_advance()


class TestEOFHandling:
    """stdin EOF (closed pipe, </dev/null): stepping must quit instead of
    busy-looping; auto-play must keep flowing without polling."""

    def test_eof_while_stepping_quits(self):
        from rsvio_tpu.cli.playback import EOF_KEY
        pc = PlaybackController(step_mode=True, key_source=keys([EOF_KEY]))
        assert not pc.wait_for_advance()
        assert pc.quit

    def test_eof_while_autoplay_keeps_playing(self):
        from rsvio_tpu.cli.playback import EOF_KEY
        pc = PlaybackController(step_mode=True,
                                key_source=keys(["a", EOF_KEY]))
        assert pc.wait_for_advance()          # toggle auto-play on
        assert all(pc.wait_for_advance() for _ in range(5))
        assert not pc.quit
