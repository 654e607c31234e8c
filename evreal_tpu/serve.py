"""Long-lived reconstruction serving runtime (beyond the reference).

The reference is batch-offline only: every run pays model load + per-frame
Python dispatch and writes scores to disk (eval.py:189-246). This module is
the deployment counterpart for the TPU pipeline: a resident engine that
loads a method once, keeps converted weights and compiled programs alive,
and turns incoming event windows into reconstructed frames for any number
of concurrent camera streams.

Design (TPU-first):

* One ``ReconEngine`` per method. Per sensor resolution it lazily builds a
  ``MethodRunner`` with ``chunk_t=1`` (one window per dispatch — the
  latency-serving configuration; the offline CLI uses big chunks for
  throughput). Compiled programs are cached per (resolution,
  capacity-bucket) by ``jax.jit``'s signature cache, so the 2nd..Nth
  stream at a resolution pays zero compiles.
* Each stream session owns only its recurrent-state pytree (a few MB in
  HBM); all sessions share params and programs. State stays device-resident
  between windows — per push, the host uploads one packed event window and
  downloads one frame.
* Windowing stays a client concern (between_frames / t_seconds / k_events
  are policies over the event stream, reference dataset.py:104-130); the
  engine consumes "one window of events" per ``push`` — the same contract
  as the model zoo's ``(params, state, voxel) -> (out, state)``.
* Event capacities are bucketed to powers of two (data/packing.py) to
  bound program variants; polarity accepts the on-disk {0,1} or ±1.

A minimal socket transport (newline JSON header with per-array
dtype/shape metadata + raw C-order bytes) and a CLI
(``python -m evreal_tpu.serve``) are included; the in-process API is the
real surface.
"""

import json
import os
import socket
import socketserver
import threading

import numpy as np

from evreal_tpu.data.packing import _MIN_CAPACITY as _MIN_PACK_CAPACITY
from evreal_tpu.data.packing import (
    U16_TS_SCALE,
    bucket_capacity,
    wire_dtypes,
    wire_format,
)

from evreal_tpu.utils import FETCH_BYTES as _FETCH_BYTES  # D2H ceiling

_MIN_SERVE_CAPACITY = _MIN_PACK_CAPACITY


def _empty_window(float_coords=False):
    dt = np.float32 if float_coords else np.int16
    return (np.array([], dt), np.array([], dt),
            np.array([], np.float64), np.array([], np.int8))


def _pack_window(xs, ys, ts, ps, capacity=None, float_coords=False,
                 dtypes=None, resolution=None, out=None):
    """One event window -> the runner's (T=1, E) packed buffers.

    ``out``: optional views to fill in place (the group path passes
    per-lane views of one pooled (N, 1, E) allocation, avoiding per-push
    allocations and a second whole-batch stack copy). Slots beyond the
    written ``count`` may hold stale events from a previous push — the
    voxelizers are count-masked (tests/test_voxelize.py poison-tail).

    ``ts`` may be absolute (zero-based here, float64 before the
    narrowing — same precision order as data/packing.py); ``ps`` may be
    the on-disk {0,1} or already ±1 (0 maps to -1, reference
    dataset.py:227). The buffer dtypes are fixed per stream at open time
    (``float_coords`` + the wire format, see ``wire_dtypes``), NOT
    inferred per push — an inferred dtype would flip the jit signature
    between pushes (e.g. an empty Python list packs float64) and each
    flip costs a fresh multi-minute compile on a degraded chip.
    ``resolution``: (h, w), required for the packed-u32 compact4 wire.
    """
    n = len(xs)
    cap = capacity or bucket_capacity(n, _MIN_SERVE_CAPACITY)
    if cap < n:
        raise ValueError(f"window of {n} events exceeds capacity {cap}")
    if dtypes is None:
        dtypes = wire_dtypes("f32", not float_coords)
    if "ev" in dtypes:
        from evreal_tpu.data.packing import encode_compact4

        if out is None:
            out = {"ev": np.zeros((1, cap), np.uint32),
                   "count": np.zeros((1,), np.int32)}
        out["count"][0] = n
        if n:
            out["ev"][0, :n] = encode_compact4(
                np.asarray(xs), np.asarray(ys), np.asarray(ts, np.float64),
                np.asarray(ps), resolution)
        return out
    if out is None:
        out = {"xs": np.zeros((1, cap), dtypes["xs"]),
               "ys": np.zeros((1, cap), dtypes["ys"]),
               "ts": np.zeros((1, cap), dtypes["ts"]),
               "ps": np.zeros((1, cap), dtypes["ps"]),
               "count": np.zeros((1,), np.int32)}
    out["count"][0] = n
    if n:
        if dtypes["xs"] == np.uint8:
            # out-of-range coords park at the 255 sentinel; the device's
            # bounds guard drops them (data/packing.py compact wire)
            xw = np.asarray(xs)
            yw = np.asarray(ys)
            out["xs"][0, :n] = np.where((xw >= 0) & (xw < 256), xw, 255)
            out["ys"][0, :n] = np.where((yw >= 0) & (yw < 256), yw, 255)
        else:
            out["xs"][0, :n] = xs
            out["ys"][0, :n] = ys
        t = np.asarray(ts, np.float64)
        if dtypes["ts"] == np.uint16:
            # the shared quantizer: parity-critical math must have ONE
            # implementation (data/packing.quantize_ts) or the streaming
            # wire silently drifts from the offline one
            from evreal_tpu.data.packing import quantize_ts

            out["ts"][0, :n] = quantize_ts(t, U16_TS_SCALE) \
                .astype(np.uint16)
        else:
            out["ts"][0, :n] = (t - t[0]).astype(np.float32)
        from evreal_tpu.data.packing import polarity_bit

        # LSB convention for unsigned input, sign for ±1 — the same rule
        # as every other wire (packing.polarity_bit)
        out["ps"][0, :n] = (polarity_bit(ps).astype(np.int8) * 2 - 1)
    return out


def _fetch(dev):
    """Device->host fetch of an (..., H, W) frame array in bounded slices
    (utils.bounded_fetch, shared with the offline drain paths). Returns a
    writable array."""
    from evreal_tpu.utils import bounded_fetch

    return bounded_fetch(dev, _FETCH_BYTES)


class _Stream:
    __slots__ = ("runner", "state", "frames", "float_coords", "dtypes")

    def __init__(self, runner, float_coords, dtypes):
        self.runner = runner
        self.state = runner.init_state()
        self.frames = 0
        self.float_coords = float_coords
        self.dtypes = dtypes


class _Group:
    __slots__ = ("runner", "state", "n", "frames", "float_coords", "dtypes",
                 "buf_pool")

    def __init__(self, runner, n, float_coords, dtypes):
        self.runner = runner
        self.state = runner.init_state()
        self.n = n
        self.frames = 0
        self.float_coords = float_coords
        self.dtypes = dtypes
        # per-capacity reused (N, 1, E) buffer sets: fresh np.zeros costs
        # a page fault per touched page per push on this 1-core host.
        # Stale tails beyond count are harmless — the voxelizers are
        # count-masked (tests/test_voxelize.py poison-tail test)
        self.buf_pool = {}


class ReconEngine:
    """Resident single-method serving engine; thread-safe via one lock
    (JAX dispatch itself is serialized per process anyway)."""

    def __init__(self, model, params, *, event_norm=False, post_norm="none",
                 num_bins=None, chunk_t=1):
        self.model = model
        self.params = params
        self.event_norm = event_norm
        self.post_norm = post_norm
        self.num_bins = num_bins if num_bins is not None else model.num_bins
        self.chunk_t = chunk_t
        self._runners = {}   # (h, w) -> MethodRunner; group keys -> Batched
        self._streams = {}   # sid -> _Stream
        self._groups = {}    # gid -> _Group
        self._next_sid = 1
        self._total_frames = 0
        self._lock = threading.Lock()

    @classmethod
    def from_method(cls, method_name, method_config=None):
        """Build from a method name exactly like the eval CLI: resolves
        ``config/method/<name>.json``, converts/caches the checkpoint
        (weights/converted), honors the method's input/output
        normalization flags."""
        from evreal_tpu.harness.config import get_method_config
        from evreal_tpu.harness.runner import MethodBundle

        cfg = dict(get_method_config(method_name))
        if method_config:
            cfg.update(method_config)
        bundle = MethodBundle(method_name, cfg)
        return cls(bundle.model, bundle.params,
                   event_norm=cfg.get("event_tensor_normalization", False),
                   post_norm=cfg.get("post_process_norm", "none"))

    def _runner(self, h, w):
        key = (int(h), int(w))
        r = self._runners.get(key)
        if r is None:
            from evreal_tpu.harness.runner import MethodRunner

            r = MethodRunner(self.model, self.params,
                             event_norm=self.event_norm,
                             post_norm=self.post_norm,
                             height=key[0], width=key[1],
                             num_bins=self.num_bins, chunk_t=self.chunk_t)
            self._runners[key] = r
        return r

    def open_stream(self, height, width, float_coords=False):
        """Register a camera stream at a sensor resolution; returns sid.
        ``float_coords``: the stream carries fractional (sub-pixel) event
        coordinates (BS-ERGB-style); fixed at open time — together with
        the wire format (``EVREAL_WIRE``, read here once) — so the
        compiled program signature never flips between pushes."""
        with self._lock:
            runner = self._runner(height, width)
            dtypes = wire_dtypes(wire_format(), not float_coords,
                                 (int(height), int(width)))
            sid = self._next_sid
            self._next_sid += 1
            self._streams[sid] = _Stream(runner, bool(float_coords), dtypes)
            return sid

    def _get(self, sid):
        try:
            return self._streams[sid]
        except KeyError:
            raise KeyError(f"unknown stream id {sid}") from None

    def push(self, sid, xs, ys, ts, ps, *, u8=False):
        """Feed one event window; returns the reconstructed frame (H, W)
        float32 in [0, 1] (or uint8 with ``u8=True`` — quantized on device,
        4x fewer device->host bytes).

        The lock covers pack + dispatch + state swap (cheap, and it is
        what keeps per-stream ordering); the device->host frame fetch —
        the slow part on a tunnel — happens outside it, so other streams'
        dispatches overlap this stream's fetch."""
        with self._lock:
            st = self._get(sid)
            bufs = _pack_window(xs, ys, ts, ps,
                                float_coords=st.float_coords,
                                dtypes=st.dtypes,
                                resolution=(st.runner.h, st.runner.w))
            state, _, clipped = st.runner.run(st.state, bufs)
            st.state = state
            st.frames += 1
            self._total_frames += 1
            out = st.runner.quantize_u8(clipped[0]) if u8 else clipped[0]
        return _fetch(out)

    def reset(self, sid):
        """Zero the stream's recurrent state (new sequence semantics —
        the reference's model.reset_states(), eval.py:197)."""
        with self._lock:
            st = self._get(sid)
            st.state = st.runner.init_state()
            st.frames = 0

    # -- lockstep group serving (throughput mode) ------------------------
    # N streams that share a frame clock (e.g. synchronized cameras, or a
    # sweep over recordings) advance together through one BatchedRunner
    # dispatch: the MXU sees N-fold larger ops and per-dispatch overhead
    # amortizes N-fold — the same lockstep axis as the offline batched
    # eval (harness/batched.py), measured 6-7x aggregate over single
    # streams on one chip (BASELINE.md). Every push_group advances ALL
    # lanes; a lane with no new events passes an empty window (zero voxel
    # grid — identical to the offline empty-window semantics).

    def open_group(self, n, height, width, float_coords=False):
        """Register n lockstep streams; returns gid. On a multi-device
        host the lane axis shards over the eval mesh ('dp') like the
        offline lockstep path, provided n divides over it."""
        from evreal_tpu.harness.batched import BatchedRunner, get_eval_mesh

        with self._lock:
            key = ("group", int(n), int(height), int(width))
            runner = self._runners.get(key)
            if runner is None:
                mesh = get_eval_mesh()
                if mesh is not None and int(n) % mesh.shape["dp"] != 0:
                    mesh = None  # lanes not dp-divisible: run unsharded
                runner = BatchedRunner(
                    self.model, self.params, event_norm=self.event_norm,
                    post_norm=self.post_norm, height=int(height),
                    width=int(width), num_bins=self.num_bins, n=int(n),
                    chunk_t=self.chunk_t, mesh=mesh)
                self._runners[key] = runner
            dtypes = wire_dtypes(wire_format(), not float_coords,
                                 (int(height), int(width)))
            gid = self._next_sid
            self._next_sid += 1
            self._groups[gid] = _Group(runner, int(n), bool(float_coords),
                                       dtypes)
            return gid

    def push_group(self, gid, windows, *, u8=False):
        """Feed one window per lane (a list of n ``(xs, ys, ts, ps)``
        tuples, or None for an empty window); returns the n reconstructed
        frames as an (n, H, W) array. The frame fetch happens outside the
        engine lock, in slices bounded by ``_FETCH_BYTES`` (one huge
        device->host fetch can wedge the tunnel's transfer path)."""
        with self._lock:
            g = self._groups.get(gid)
            if g is None:
                raise KeyError(f"unknown group id {gid}")
            if len(windows) != g.n:
                raise ValueError(
                    f"group {gid} has {g.n} lanes, got {len(windows)}")
            empty = _empty_window(g.float_coords)
            wins = [w if w is not None else empty for w in windows]
            cap = bucket_capacity(max((len(w[0]) for w in wins), default=0),
                                  _MIN_SERVE_CAPACITY)
            # ONE pooled (N, T=1, E) allocation per capacity bucket,
            # packed per lane through views — the BatchedRunner's buffer
            # contract, without per-push allocations or a whole-batch
            # stack copy (_Group.buf_pool comment)
            bufs = g.buf_pool.get(cap)
            if bufs is None:
                from evreal_tpu.data.packing import alloc_buffers

                bufs = g.buf_pool[cap] = alloc_buffers((g.n, 1), cap,
                                                       g.dtypes)
            for j, w in enumerate(wins):
                _pack_window(*w, capacity=cap,
                             float_coords=g.float_coords,
                             dtypes=g.dtypes,
                             resolution=(g.runner.h, g.runner.w),
                             out={k: v[j] for k, v in bufs.items()})
            state, _, clipped = g.runner.run(g.state, bufs)
            g.state = state
            served = sum(1 for w in windows if w is not None)
            g.frames += served
            self._total_frames += served
            out = clipped[:, 0]
            if u8:
                out = g.runner.quantize_u8(out)
        return _fetch(out)

    def reset_group(self, gid):
        with self._lock:
            g = self._groups[gid]
            g.state = g.runner.init_state()
            g.frames = 0

    def close_group(self, gid):
        with self._lock:
            self._groups.pop(gid, None)

    def close(self, sid):
        with self._lock:
            self._streams.pop(sid, None)

    def stats(self):
        with self._lock:
            return {"streams": len(self._streams),
                    "groups": sorted((g.n for g in self._groups.values())),
                    "resolutions": sorted(k for k in self._runners
                                          if k[0] != "group"),
                    # monotonic engine-lifetime counter: closing a stream
                    # must not make a monitoring dashboard go backwards,
                    # and idle (None) group lanes are not served frames
                    "frames": self._total_frames}


# ---------------------------------------------------------------------------
# socket transport: one newline-terminated JSON header per message carrying
# per-array {dtype, shape} metadata, followed by the arrays' raw bytes
# (C-order). Sockets are not seekable, which rules out np.save/np.load.
# ---------------------------------------------------------------------------

def _send(fobj, header, arrays=()):
    arrays = [np.ascontiguousarray(a) for a in arrays]
    header = dict(header)
    header["meta"] = [{"dtype": a.dtype.str, "shape": list(a.shape)}
                      for a in arrays]
    fobj.write((json.dumps(header) + "\n").encode())
    for a in arrays:
        fobj.write(a.tobytes())
    fobj.flush()


def _read_exact(fobj, n):
    chunks = []
    while n:
        b = fobj.read(n)
        if not b:
            raise EOFError("connection closed mid-payload")
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def _recv(fobj):
    line = fobj.readline()
    if not line:
        return None, []
    header = json.loads(line.decode())
    arrays = []
    for m in header.get("meta", []):
        dt = np.dtype(m["dtype"])
        shape = tuple(m["shape"])
        count = int(np.prod(shape, dtype=np.int64))
        buf = _read_exact(fobj, count * dt.itemsize)
        # bytearray: np.frombuffer over bytes yields read-only arrays, and
        # a client must get the same writable frames the in-process API
        # returns
        arrays.append(np.frombuffer(bytearray(buf), dt).reshape(shape))
    return header, arrays


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        engine = self.server.engine
        while True:
            try:
                header, arrays = _recv(self.rfile)
            except (ValueError, OSError, EOFError):
                break
            if header is None:
                break
            try:
                op = header["op"]
                if op == "open":
                    sid = engine.open_stream(
                        header["height"], header["width"],
                        float_coords=bool(header.get("float_coords",
                                                     False)))
                    _send(self.wfile, {"ok": True, "sid": sid})
                elif op == "push":
                    xs, ys, ts, ps = arrays
                    frame = engine.push(header["sid"], xs, ys, ts, ps,
                                        u8=bool(header.get("u8", False)))
                    _send(self.wfile, {"ok": True}, [frame])
                elif op == "reset":
                    engine.reset(header["sid"])
                    _send(self.wfile, {"ok": True})
                elif op == "close":
                    engine.close(header["sid"])
                    _send(self.wfile, {"ok": True})
                elif op == "open_group":
                    gid = engine.open_group(
                        header["n"], header["height"], header["width"],
                        float_coords=bool(header.get("float_coords",
                                                     False)))
                    _send(self.wfile, {"ok": True, "gid": gid})
                elif op == "push_group":
                    n = int(header["n"])
                    # per-lane presence mask: an idle (None) lane must
                    # reach the engine as None so it is not counted as a
                    # served frame (stats contract); older clients send
                    # no mask = all lanes real
                    mask = header.get("mask")
                    wins = [tuple(arrays[4 * i:4 * i + 4])
                            if (mask is None or mask[i]) else None
                            for i in range(n)]
                    frames = engine.push_group(
                        header["gid"], wins,
                        u8=bool(header.get("u8", False)))
                    _send(self.wfile, {"ok": True}, [frames])
                elif op == "reset_group":
                    engine.reset_group(header["gid"])
                    _send(self.wfile, {"ok": True})
                elif op == "close_group":
                    engine.close_group(header["gid"])
                    _send(self.wfile, {"ok": True})
                elif op == "stats":
                    _send(self.wfile, {"ok": True, **engine.stats()})
                else:
                    _send(self.wfile, {"ok": False,
                                       "error": f"unknown op {op!r}"})
            except BrokenPipeError:
                break
            except Exception as e:  # noqa: BLE001 — a bad request must not
                # kill the server; report and keep the connection
                try:
                    _send(self.wfile, {"ok": False,
                                       "error": f"{type(e).__name__}: {e}"})
                except OSError:
                    break


class ReconServer(socketserver.ThreadingUnixStreamServer):
    """Unix-socket server over a ReconEngine (engine lock serializes
    device work across client threads)."""

    daemon_threads = True

    def __init__(self, engine, path):
        if os.path.exists(path):
            # only remove a STALE SOCKET: a regular file also fails the
            # connect probe, and silently unlinking it would destroy a
            # user's file; a live socket must not be hijacked either
            import stat

            if not stat.S_ISSOCK(os.stat(path).st_mode):
                raise OSError(f"{path}: exists and is not a socket")
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            try:
                probe.connect(path)
            except OSError:
                os.unlink(path)  # nobody listening: stale
            else:
                probe.close()
                raise OSError(f"{path}: a server is already listening")
            finally:
                probe.close()
        super().__init__(path, _Handler)
        self.engine = engine


class ReconClient:
    """Minimal blocking client for ReconServer's protocol."""

    def __init__(self, path):
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.connect(path)
        self._f = self._sock.makefile("rwb")

    def _call(self, header, arrays=()):
        _send(self._f, header, arrays)
        resp, payload = _recv(self._f)
        if resp is None:
            raise ConnectionError("server closed the connection")
        if not resp.get("ok"):
            raise RuntimeError(resp.get("error", "server error"))
        return resp, payload

    def open_stream(self, height, width, float_coords=False):
        resp, _ = self._call({"op": "open", "height": int(height),
                              "width": int(width),
                              "float_coords": bool(float_coords)})
        return resp["sid"]

    def push(self, sid, xs, ys, ts, ps, u8=False):
        _, payload = self._call(
            {"op": "push", "sid": sid, "u8": bool(u8)},
            [np.asarray(xs), np.asarray(ys),
             np.asarray(ts, np.float64), np.asarray(ps)])
        return payload[0]

    def reset(self, sid):
        self._call({"op": "reset", "sid": sid})

    def close_stream(self, sid):
        self._call({"op": "close", "sid": sid})

    def open_group(self, n, height, width, float_coords=False):
        resp, _ = self._call({"op": "open_group", "n": int(n),
                              "height": int(height), "width": int(width),
                              "float_coords": bool(float_coords)})
        return resp["gid"]

    def push_group(self, gid, windows, u8=False):
        """``windows``: n ``(xs, ys, ts, ps)`` tuples (None = empty
        window); returns the (n, H, W) frames. None lanes travel as a
        presence mask so the server's served-frame stats match the
        in-process API (idle lanes are not served frames)."""
        arrays, mask = [], []
        for w in windows:
            mask.append(w is not None)
            if w is None:
                w = _empty_window()
            arrays += [np.asarray(w[0]), np.asarray(w[1]),
                       np.asarray(w[2], np.float64), np.asarray(w[3])]
        _, payload = self._call(
            {"op": "push_group", "gid": gid, "n": len(windows),
             "u8": bool(u8), "mask": mask}, arrays)
        return payload[0]

    def reset_group(self, gid):
        self._call({"op": "reset_group", "gid": gid})

    def close_group(self, gid):
        self._call({"op": "close_group", "gid": gid})

    def stats(self):
        resp, _ = self._call({"op": "stats"})
        return {k: v for k, v in resp.items() if k not in ("ok", "meta")}

    def close(self):
        try:
            self._f.close()
        finally:
            self._sock.close()


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="evreal_tpu reconstruction server")
    parser.add_argument("-m", "--method", required=True,
                        help="method name (config/method/<name>.json)")
    parser.add_argument("--socket", default="/tmp/evreal_serve.sock",
                        help="unix socket path")
    args = parser.parse_args(argv)

    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    engine = ReconEngine.from_method(args.method)
    server = ReconServer(engine, args.socket)
    print(f"serving {args.method} on {args.socket}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
