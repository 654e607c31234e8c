"""Serving runtime (evreal_tpu/serve.py): the resident engine must produce
exactly the offline pipeline's frames, keep streams isolated, and survive a
socket round-trip."""

import threading

import numpy as np
import pytest

from evreal_tpu.models import build_flagship_e2vid
from evreal_tpu.serve import ReconClient, ReconEngine, ReconServer

H, W, NBINS = 32, 48, 5


@pytest.fixture(autouse=True)
def _f32_wire(monkeypatch):
    """These tests assert bit-near streaming==offline equality against
    hand-built f32 buffers; pin the strict-parity wire so they stay valid
    when the ambient environment selects a quantizing wire. Wire-format
    coverage (incl. serve's packer) lives in test_wire_compact.py."""
    monkeypatch.setenv("EVREAL_WIRE", "f32")


@pytest.fixture(scope="module")
def model_params():
    return build_flagship_e2vid(seed=0)


def _windows(seed, n_windows, events_per=700):
    rng = np.random.default_rng(seed)
    wins = []
    t0 = 0.0
    for _ in range(n_windows):
        n = int(events_per * rng.uniform(0.5, 1.5))
        ts = np.sort(rng.uniform(t0, t0 + 0.03, n))
        wins.append({
            "xs": rng.integers(0, W, n).astype(np.int16),
            "ys": rng.integers(0, H, n).astype(np.int16),
            "ts": ts,
            "ps": rng.integers(0, 2, n).astype(np.uint8),  # on-disk {0,1}
        })
        t0 += 0.03
    return wins


def _push_all(engine, sid, wins, **kw):
    return [engine.push(sid, w["xs"], w["ys"], w["ts"], w["ps"], **kw)
            for w in wins]


def test_engine_matches_chunked_offline_runner(model_params):
    """Streaming one window per push == the offline chunked pipeline on the
    same windows (state carry across dispatch boundaries is exact)."""
    from evreal_tpu.data.packing import pack_windows  # noqa: F401 (doc)
    from evreal_tpu.harness.runner import MethodRunner

    model, params = model_params
    wins = _windows(0, 5)

    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")
    sid = engine.open_stream(H, W)
    frames = _push_all(engine, sid, wins)

    runner = MethodRunner(model, params, event_norm=True, post_norm="robust",
                          height=H, width=W, num_bins=NBINS,
                          chunk_t=len(wins))
    cap = 2048
    bufs = {"xs": np.zeros((len(wins), cap), np.int16),
            "ys": np.zeros((len(wins), cap), np.int16),
            "ts": np.zeros((len(wins), cap), np.float32),
            "ps": np.zeros((len(wins), cap), np.int8),
            "count": np.zeros((len(wins),), np.int32)}
    for i, wnd in enumerate(wins):
        n = len(wnd["xs"])
        bufs["count"][i] = n
        bufs["xs"][i, :n] = wnd["xs"]
        bufs["ys"][i, :n] = wnd["ys"]
        bufs["ts"][i, :n] = (wnd["ts"] - wnd["ts"][0]).astype(np.float32)
        bufs["ps"][i, :n] = wnd["ps"].astype(np.int8) * 2 - 1
    _, _, clipped = runner.run(runner.init_state(), bufs)
    clipped = np.asarray(clipped)

    for i, f in enumerate(frames):
        np.testing.assert_allclose(f, clipped[i], rtol=0, atol=1e-6)


def test_polarity_conventions_equivalent(model_params):
    """{0,1} polarity input and explicit ±1 must reconstruct identically."""
    model, params = model_params
    wins = _windows(1, 2)
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")

    sid_a = engine.open_stream(H, W)
    fa = _push_all(engine, sid_a, wins)
    sid_b = engine.open_stream(H, W)
    fb = [engine.push(sid_b, w["xs"], w["ys"], w["ts"],
                      w["ps"].astype(np.int8) * 2 - 1) for w in wins]
    for a, b in zip(fa, fb):
        assert np.array_equal(a, b)


def test_multi_stream_isolation_and_reset(model_params):
    """Interleaved streams must match independent runs; reset must return a
    stream to its fresh-state output."""
    model, params = model_params
    wins_a, wins_b = _windows(2, 3), _windows(3, 3)
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")

    sa, sb = engine.open_stream(H, W), engine.open_stream(H, W)
    inter_a, inter_b = [], []
    for wa, wb in zip(wins_a, wins_b):
        inter_a.append(engine.push(sa, wa["xs"], wa["ys"], wa["ts"],
                                   wa["ps"]))
        inter_b.append(engine.push(sb, wb["xs"], wb["ys"], wb["ts"],
                                   wb["ps"]))

    solo = ReconEngine(model, params, event_norm=True, post_norm="robust")
    ss = solo.open_stream(H, W)
    solo_a = _push_all(solo, ss, wins_a)
    for x, y in zip(inter_a, solo_a):
        assert np.array_equal(x, y)

    # reset: replay of wins_b from scratch must equal a fresh stream
    engine.reset(sb)
    replay = _push_all(engine, sb, wins_b)
    sc = engine.open_stream(H, W)
    fresh = _push_all(engine, sc, wins_b)
    for x, y in zip(replay, fresh):
        assert np.array_equal(x, y)

    st = engine.stats()
    assert st["streams"] == 3 and st["resolutions"] == [(H, W)]
    engine.close(sa)
    assert engine.stats()["streams"] == 2


def test_u8_frames(model_params):
    model, params = model_params
    (wnd,) = _windows(4, 1)
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")
    sid = engine.open_stream(H, W)
    f32 = engine.push(sid, wnd["xs"], wnd["ys"], wnd["ts"], wnd["ps"])
    engine.reset(sid)
    u8 = engine.push(sid, wnd["xs"], wnd["ys"], wnd["ts"], wnd["ps"],
                     u8=True)
    assert u8.dtype == np.uint8
    assert np.array_equal(u8, np.round(np.clip(f32, 0, 1) * 255)
                          .astype(np.uint8))


def test_zero_event_window(model_params):
    """An empty window must run (zero voxel grid, reference
    dataset.py:59-75 semantics) and advance the recurrent state."""
    model, params = model_params
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")
    sid = engine.open_stream(H, W)
    e = np.array([], np.int16)
    f = engine.push(sid, e, e, np.array([], np.float64), np.array([], np.int8))
    assert f.shape == (H, W) and np.isfinite(f).all()


def test_group_matches_single_streams(model_params):
    """Lockstep group serving (throughput mode) must reconstruct each lane
    exactly as a solo stream fed the same windows; empty lanes must match
    a solo stream fed an empty window."""
    model, params = model_params
    lanes = [_windows(10, 3), _windows(11, 3), _windows(12, 3)]
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")

    gid = engine.open_group(3, H, W)
    got = []
    for t in range(3):
        wins = [lanes[j][t] for j in range(3)]
        if t == 1:
            wins[2] = None  # lane 2 idles this tick
        got.append(engine.push_group(
            gid, [None if w is None else (w["xs"], w["ys"], w["ts"],
                                          w["ps"]) for w in wins]))

    e = np.array([], np.int16)
    for j in range(3):
        sid = engine.open_stream(H, W)
        for t in range(3):
            w = lanes[j][t]
            if t == 1 and j == 2:
                solo = engine.push(sid, e, e, np.array([], np.float64),
                                   np.array([], np.int8))
            else:
                solo = engine.push(sid, w["xs"], w["ys"], w["ts"], w["ps"])
            # batch-N conv programs accumulate in a different order than
            # batch-1 (XLA algorithm choice); the offline batched path
            # shows the same ~1e-4 pixel-level spread (test_batched_eval
            # compares scores at 1e-5, txt rows at 5 decimals)
            np.testing.assert_allclose(got[t][j], solo, rtol=0, atol=5e-4)

    engine.reset_group(gid)
    st = engine.stats()
    assert st["groups"] == [3]
    engine.close_group(gid)
    assert engine.stats()["groups"] == []


def test_socket_roundtrip(model_params, tmp_path):
    model, params = model_params
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")
    path = str(tmp_path / "serve.sock")
    server = ReconServer(engine, path)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        wins = _windows(5, 2)
        client = ReconClient(path)
        sid = client.open_stream(H, W)
        got = [client.push(sid, w["xs"], w["ys"], w["ts"], w["ps"])
               for w in wins]

        ref_engine = ReconEngine(model, params, event_norm=True,
                                 post_norm="robust")
        rid = ref_engine.open_stream(H, W)
        want = _push_all(ref_engine, rid, wins)
        for g, w_ in zip(got, want):
            assert np.array_equal(g, w_)

        st = client.stats()
        assert st["streams"] == 1 and st["frames"] == 2

        # error path: bad sid reports, connection survives
        with pytest.raises(RuntimeError):
            client.push(999, wins[0]["xs"], wins[0]["ys"], wins[0]["ts"],
                        wins[0]["ps"])
        client.reset(sid)
        client.close_stream(sid)
        assert client.stats()["streams"] == 0

        # group ops over the wire: 2 lanes, lane 1 idle, equals in-process
        gid = client.open_group(2, H, W)
        w0 = wins[0]
        frames = client.push_group(
            gid, [(w0["xs"], w0["ys"], w0["ts"], w0["ps"]), None])
        g2 = ref_engine.open_group(2, H, W)
        want_g = ref_engine.push_group(
            g2, [(w0["xs"], w0["ys"], w0["ts"], w0["ps"]), None])
        assert np.array_equal(frames, want_g)
        client.close_group(gid)

        # idle lanes travel as a presence mask: the socket server's
        # served-frame count must match the in-process engine (the idle
        # lane is NOT a served frame — stats() docstring contract)
        assert client.stats()["frames"] == ref_engine.stats()["frames"]

        # review regressions: client frames are writable (the in-process
        # API returns writable arrays; np.frombuffer over bytes is not);
        # stats has no protocol-framing keys; the frame counter is
        # engine-lifetime monotonic (closing a stream must not make a
        # dashboard go backwards)
        got[0] *= 0.5
        assert "meta" not in st
        assert client.stats()["frames"] >= 2

        # a second server on a LIVE socket path must refuse, not hijack
        with pytest.raises(OSError, match="already listening"):
            ReconServer(ref_engine, path)
        client.close()

        # protocol robustness: an unknown op gets an error response and
        # the connection survives; a non-JSON line breaks framing, so the
        # server must drop that connection (not the process) and keep
        # serving new ones
        c2 = ReconClient(path)
        with pytest.raises(RuntimeError, match="unknown op"):
            c2._call({"op": "bogus"})
        assert c2.stats()["streams"] == 0  # same connection still works
        c2._f.write(b"not json\n")
        c2._f.flush()
        with pytest.raises((ConnectionError, OSError)):
            c2.stats()
        c3 = ReconClient(path)
        assert c3.stats()["streams"] == 0
        c3.close()
    finally:
        server.shutdown()
        server.server_close()

def test_server_refuses_non_socket_path(model_params, tmp_path):
    """A regular file at the socket path also fails the stale-socket
    connect probe; it must be refused, never unlinked (review finding:
    the cleanup destroyed a user's file)."""
    model, params = model_params
    engine = ReconEngine(model, params, event_norm=True, post_norm="robust")
    path = tmp_path / "not_a_socket"
    path.write_text("precious")
    with pytest.raises(OSError, match="not a socket"):
        ReconServer(engine, str(path))
    assert path.read_text() == "precious"  # still there


def test_bounded_fetch_slices_and_recurses():
    """utils.bounded_fetch must return value-identical writable arrays for
    every slicing regime: small (single fetch), leading-axis sliced, and
    recursive (a single leading-axis item exceeds the budget)."""
    from evreal_tpu.utils import bounded_fetch

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for shape, max_bytes in [
        ((3, 4), 1 << 20),          # small: one fetch
        ((8, 64, 64), 64 * 64 * 4 * 2 + 1),   # leading-axis slices
        ((2, 3, 128, 128), 128 * 128 * 4 * 2 + 1),  # recursive
    ]:
        host = rng.normal(size=shape).astype(np.float32)
        dev = jnp.asarray(host)
        got = bounded_fetch(dev, max_bytes)
        assert np.array_equal(got, host), shape
        got[(0,) * got.ndim] = 42.0  # writable
