"""Production inference: a pre-compiled engine + a batch HTTP endpoint.

The reference serves through a gradio demo (reference demo.py:304-359) that
re-runs an eager torch model per request. The TPU-native serving path is an
ahead-of-time-compiled engine:

  - weights live on device in bfloat16 (halves weight HBM traffic);
  - `reconstruct`, `render`, and the fused `reconstruct_and_render` are
    jitted once per input shape and reused across requests (shape -> program
    cache);
  - inputs stream with `jax.device_put` ahead of dispatch (async H2D);
  - `throughput()` reports honest scenes/sec using the in-jit loop
    methodology (tools/benchlib.py) rather than wall-clocking dispatches.

`python -m vicasplat_tpu.serving --ckpt ... --port 8644` exposes
POST /reconstruct (raw float32 or compressed-JPEG clips) and
POST /reconstruct_video (long videos via sliding-window streaming) for
pipeline integration; heavy viewers should use demo.py +
visualization/viewer_server.py instead. Opt-in throughput knobs:
--quantize (int8 W8A8) and --prune (low-opacity splat dropping) — see
docs/DEPLOY.md §3.
"""
from __future__ import annotations

import dataclasses
import functools
import io
import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decoder.splatting import DecoderSplattingConfig, decoder_forward
from .models import VicaSplatConfig, init_vicasplat, vicasplat_forward
from .models.vicasplat import normalize_images


@dataclasses.dataclass
class SceneBatch:
    """Device-resident reconstruction output for a batch of videos."""
    gaussians: object            # models.adapter.Gaussians, (B, T, H, W, ...)
    poses: jnp.ndarray           # (B, T, 4, 4) c2w, frame 0 = identity
    intrinsics: Optional[jnp.ndarray]  # (B, T, 3, 3) when predicted
    # scene-adaptive rasterizer caps, filled on first render when the
    # engine runs with adaptive_caps=True (ops/rasterize/
    # select_raster_config — the escape hatch for dense scenes that
    # overflow the default dup_hw/max_per_tile static caps). Use for
    # checkpoints trained with an UNBOUNDED rasterizer (e.g. converted
    # reference ckpts); checkpoints trained through our capped renderer
    # compensate for the caps and render WORSE when they are raised
    # (-6..-10 dB measured, DESIGN.md §1 cap-consistency) — keep the
    # default off for those.
    raster_cfg: Optional[object] = None


class InferenceEngine:
    """Shape-cached, bf16-resident VicaSplat inference."""

    def __init__(self, cfg: VicaSplatConfig, params=None, ckpt: str = None,
                 dtype=jnp.bfloat16,
                 decoder: DecoderSplattingConfig = DecoderSplattingConfig(),
                 view_mesh=None, quantize: bool = False,
                 quantize_min_size: Optional[int] = None,
                 quantize_exclude: Optional[tuple] = None,
                 adaptive_caps: bool = False):
        """view_mesh: optional jax.sharding.Mesh — trajectory renders then
        shard the view axis over it (parallel/view_parallel.py); one
        reconstructed scene's Gaussians replicate over ICI and each device
        renders its slice of the requested views.

        quantize=True prepares int8 weights for every large linear (W8A8,
        ops/quant.py): 2x MXU peak + half the weight HBM traffic. By
        default the measured-sensitive families (quant.SENSITIVE_PATHS —
        the expm1-amplified center head, -2.0 dB alone vs -0.16 dB for
        the other 18 together, job 043) stay float; pass
        quantize_exclude=() to quantize everything, or your own path
        tuple after a sensitivity pass on your checkpoint
        (quant.quantizable_paths + include_only).
        """
        self.cfg = cfg
        self.dec_cfg = decoder
        self.dtype = dtype
        self.view_mesh = view_mesh
        self.adaptive_caps = adaptive_caps
        if params is None:
            if ckpt is not None:
                from .utils.checkpointing import load_weights

                params = load_weights(
                    ckpt, template=init_vicasplat(jax.random.PRNGKey(0), cfg))
            else:
                params = init_vicasplat(jax.random.PRNGKey(0), cfg)
        from .ops.quant import cast_tree_preserving_quant, quantize_tree

        self.n_quantized = 0
        if quantize:
            from .ops.quant import SENSITIVE_PATHS

            # quantize from the f32 masters; quantize_min_size overrides the
            # default per-layer kernel-size threshold
            kw = ({} if quantize_min_size is None
                  else {"min_size": quantize_min_size})
            kw["exclude"] = (SENSITIVE_PATHS if quantize_exclude is None
                             else tuple(quantize_exclude))
            params, self.n_quantized = quantize_tree(params, **kw)
        # bf16-resident weights: the TPU analogue of serving in TF32/fp16;
        # int8 kernels + their f32 channel scales keep their dtypes
        self.params = cast_tree_preserving_quant(params, dtype)

    # ---- jitted programs, cached per input shape ----

    def _reconstruct_raw(self):
        """The un-jitted reconstruct program (also the AOT-export surface,
        export.py)."""
        def fn(params, images01, intrinsics):
            ctx = {"image": normalize_images(images01, self.cfg)}
            if intrinsics is not None:
                ctx["intrinsics"] = intrinsics
            out = vicasplat_forward(params, self.cfg, ctx, dtype=self.dtype)
            return (out["gaussians"], out["gaussian_camera_extrins"],
                    out["gaussian_camera_intrins"])

        return fn

    @functools.lru_cache(maxsize=8)
    def _reconstruct_fn(self, shape):
        return jax.jit(self._reconstruct_raw())

    def _render_raw(self, image_shape, raster_cfg=None):
        """The un-jitted render program for a static output resolution."""
        dec_cfg = (self.dec_cfg if raster_cfg is None else
                   dataclasses.replace(self.dec_cfg, rasterize=raster_cfg))

        def fn(params_unused, gaussians, extrinsics, intrinsics, near, far):
            if self.view_mesh is not None:
                from .parallel.view_parallel import decoder_forward_view_sharded

                return decoder_forward_view_sharded(
                    dec_cfg, gaussians, extrinsics, intrinsics, near,
                    far, image_shape, mesh=self.view_mesh,
                )
            return decoder_forward(
                dec_cfg, gaussians, extrinsics, intrinsics, near, far,
                image_shape,
            )

        return fn

    @functools.lru_cache(maxsize=8)
    def _render_fn(self, vshape, image_shape, raster_cfg=None):
        return jax.jit(self._render_raw(image_shape, raster_cfg))

    def _select_caps(self, scene: SceneBatch, extrinsics, intrinsics,
                     image_shape):
        """Scene-level adaptive caps: probe the first view once, cache on
        the SceneBatch (shape-cached recompile per distinct selection)."""
        from .decoder.splatting import flatten_gaussians
        from .geometry.se3 import rigid_inverse
        from .models.adapter import build_covariance
        from .ops.rasterize.render import select_raster_config

        g = scene.gaussians
        if g.means.ndim > 3:
            g = flatten_gaussians(g)
        cov = (g.covariances if g.covariances is not None
               else build_covariance(g.scales, g.rotations))
        sh_degree = int(round(g.harmonics.shape[-1] ** 0.5)) - 1
        return select_raster_config(
            g.means[0], cov[0], g.harmonics[0], g.opacities[0],
            rigid_inverse(jnp.asarray(extrinsics[0, 0], jnp.float32)),
            jnp.asarray(intrinsics[0, 0], jnp.float32), tuple(image_shape),
            sh_degree, base=self.dec_cfg.rasterize,
        )

    # ---- public API ----

    def reconstruct(self, images01, intrinsics=None) -> SceneBatch:
        """images01: (B, T, H, W, 3) float in [0, 1] (numpy or jax)."""
        images01 = jax.device_put(jnp.asarray(images01, jnp.float32))
        if intrinsics is not None:
            intrinsics = jax.device_put(jnp.asarray(intrinsics, jnp.float32))
        g, poses, intr = self._reconstruct_fn(images01.shape)(
            self.params, images01, intrinsics)
        return SceneBatch(gaussians=g, poses=poses, intrinsics=intr)

    def render(self, scene: SceneBatch, extrinsics, intrinsics,
               image_shape, near=0.05, far=100.0):
        extrinsics = jnp.asarray(extrinsics, jnp.float32)
        intrinsics = jnp.asarray(intrinsics, jnp.float32)
        B, V = extrinsics.shape[:2]
        rcfg = None
        if self.adaptive_caps:
            if scene.raster_cfg is None:
                scene.raster_cfg = self._select_caps(
                    scene, extrinsics, intrinsics, image_shape)
            rcfg = scene.raster_cfg
        out = self._render_fn(extrinsics.shape, tuple(image_shape), rcfg)(
            None, scene.gaussians, extrinsics, intrinsics,
            jnp.full((B, V), near), jnp.full((B, V), far))
        return out

    def throughput(self, images01, intrinsics=None, iters: int = 12) -> dict:
        """Honest scenes/sec of the fused reconstruct path (in-jit loop,
        full-sync, overhead-differenced)."""
        images01 = jnp.asarray(images01, jnp.float32)
        if intrinsics is not None:
            intrinsics = jnp.asarray(intrinsics, jnp.float32)

        def once(img):
            ctx = {"image": normalize_images(img, self.cfg)}
            if intrinsics is not None:
                ctx["intrinsics"] = intrinsics
            out = vicasplat_forward(self.params, self.cfg, ctx,
                                    dtype=self.dtype)
            g = out["gaussians"]
            # means (center head), scales/opacities (gs head) and poses keep
            # every stage live; the 157 MB harmonics tensor is produced by
            # the same head output and is skipped to keep the loop's compile
            # small (oversized programs crash the remote compile service)
            return (g.means, g.scales, g.opacities,
                    out["gaussian_camera_extrins"])

        @jax.jit
        def loop(eps_arr, img):
            def body(c, eps):
                outs = once(img + eps)
                s = c
                for leaf in jax.tree.leaves(outs):
                    s = s + jnp.sum(jnp.abs(leaf)).astype(jnp.float32)
                return s, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), eps_arr)
            return jnp.broadcast_to(acc, (8, 128))

        def run(n):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(
                loop(jnp.zeros((n,), jnp.float32), images01)))
            return time.perf_counter() - t0

        b = images01.shape[0]
        try:
            run(2), run(iters)
            dt = (run(iters) - run(2)) / (iters - 2)
            method = "in-jit-loop"
        except Exception:
            # some environments' remote compile services reject the scan-
            # wrapped program; fall back to coarse dispatch timing (includes
            # per-dispatch overhead — an upper bound on latency)
            f = jax.jit(once)
            np.asarray(jax.device_get(jax.tree.leaves(f(images01))[0]))
            t0 = time.perf_counter()
            out = f(images01)
            np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
            dt = time.perf_counter() - t0
            method = "single-dispatch-upper-bound"
        return {"latency_s": dt, "scenes_per_s": b / dt, "batch": b,
                "method": method}


# ---------------------------------------------------------------------------
# HTTP endpoint
# ---------------------------------------------------------------------------

def make_handler(engine: InferenceEngine):
    import http.server

    class Handler(http.server.BaseHTTPRequestHandler):
        def _read_payload(self):
            length = int(self.headers["Content-Length"])
            return np.load(io.BytesIO(self.rfile.read(length)),
                           allow_pickle=False)

        def _send_json(self, resp: dict, status: int = 200):
            body = json.dumps(resp).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            try:
                self._do_POST()
            except (ValueError, KeyError) as e:
                # bad request (missing field, frames < window, ...) -> 400
                # with the message, instead of a dead handler thread and a
                # dropped connection
                self._send_json({"error": f"{type(e).__name__}: {e}"},
                                status=400)

        def _do_POST(self):
            if self.path == "/reconstruct_video":
                # long-video request: (F, H, W, 3) frames streamed through
                # sliding windows (streaming.reconstruct_video)
                from .streaming import reconstruct_video

                payload = self._read_payload()
                intr = (payload["intrinsics"] if "intrinsics" in payload
                        else None)
                t0 = time.perf_counter()
                scene = reconstruct_video(
                    engine, payload["images"], intr,
                    window=int(payload["window"]) if "window" in payload
                    else 8,
                    overlap=int(payload["overlap"]) if "overlap" in payload
                    else 2)
                means = np.asarray(jax.device_get(scene.gaussians.means))
                self._send_json({
                    "poses": scene.poses.tolist(),
                    "window_scales": scene.window_scales.tolist(),
                    "num_gaussians": int(np.prod(means.shape[:-1])),
                    "latency_s": time.perf_counter() - t0,
                })
                return
            if self.path != "/reconstruct":
                self.send_response(404)
                self.end_headers()
                return
            payload = self._read_payload()
            if "jpeg_data" in payload:
                # compressed request (~20x smaller than raw f32): frames as
                # one concatenated JPEG byte stream + per-frame sizes +
                # (B, T); decoded by the native batch decoder (data/native),
                # PIL fallback inside decode_jpegs_u8
                from .data.dataset_re10k import decode_jpegs_u8

                sizes = payload["jpeg_sizes"].astype(np.int64)
                data = payload["jpeg_data"]
                ends = np.cumsum(sizes)
                bufs = [data[e - s:e] for s, e in zip(sizes, ends)]
                bt_shape = tuple(payload["batch_shape"])  # (B, T)
                u8 = decode_jpegs_u8(bufs)  # (B*T, H, W, 3) u8
                images = (
                    u8.reshape(*bt_shape, *u8.shape[1:]).astype(np.float32)
                    / 255.0
                )
            else:
                images = payload["images"]  # (B, T, H, W, 3) float32 [0,1]
            intr = payload["intrinsics"] if "intrinsics" in payload else None
            t0 = time.perf_counter()
            scene = engine.reconstruct(images, intr)
            poses = np.asarray(jax.device_get(scene.poses))
            means = np.asarray(jax.device_get(scene.gaussians.means))
            dt = time.perf_counter() - t0
            self._send_json({
                "poses": poses.tolist(),
                "num_gaussians": int(np.prod(means.shape[:-1])),
                "centers_mean": np.mean(means, axis=(1, 2, 3)).tolist(),
                "latency_s": dt,
            })

        def log_message(self, *a):
            pass

    return Handler


def serve(engine: InferenceEngine, port: int = 8644, block: bool = True):
    import http.server
    import threading

    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(engine))
    if block:
        print(f"serving on http://127.0.0.1:{port}/reconstruct")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.server_close()
        return None
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def main():
    import argparse

    from .models import GaussianAdapterConfig, VicaNetConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--port", type=int, default=8644)
    ap.add_argument("--quantize", action="store_true",
                    help="int8 W8A8 for the big linears (experimental; "
                         "validate accuracy per checkpoint)")
    ap.add_argument("--prune", type=float, default=0.0,
                    help="drop this fraction of lowest-opacity splats "
                         "before rendering (serving-throughput knob)")
    args = ap.parse_args()
    cfg = VicaSplatConfig(backbone=VicaNetConfig(),
                          gaussian_adapter=GaussianAdapterConfig(sh_degree=4))
    dec = DecoderSplattingConfig(prune_fraction=args.prune)
    serve(InferenceEngine(cfg, ckpt=args.ckpt, quantize=args.quantize,
                          decoder=dec), port=args.port)


if __name__ == "__main__":
    main()
