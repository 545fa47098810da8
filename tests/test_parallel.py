"""Sharding tests on the 8-virtual-device CPU mesh: DP batch sharding,
FSDP param sharding, and a sharded train step executing correctly."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vicasplat_tpu.parallel import make_mesh, replicate, shard_batch
from vicasplat_tpu.parallel.mesh import shard_params_fsdp


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_shard_batch(self):
        mesh = make_mesh()
        batch = {"x": jnp.ones((8, 4, 4)), "nested": {"y": jnp.zeros((8, 2))}}
        sharded = shard_batch(mesh, batch)
        assert not sharded["x"].sharding.is_fully_replicated
        # each device holds 1/8 of the batch
        assert sharded["x"].addressable_shards[0].data.shape == (1, 4, 4)

    def test_fsdp_sharding(self):
        mesh = make_mesh()
        params = {
            "big": jnp.ones((1024, 256)),     # sharded (1024 % 8 == 0)
            "small": jnp.ones((4,)),          # replicated (too small)
            "odd": jnp.ones((257, 1023)),     # no divisible dim -> replicated
        }
        sharded = shard_params_fsdp(mesh, params)
        assert not sharded["big"].sharding.is_fully_replicated
        assert sharded["big"].addressable_shards[0].data.shape == (128, 256)
        assert sharded["small"].sharding.is_fully_replicated
        assert sharded["odd"].sharding.is_fully_replicated

    def test_dp_psum_semantics(self):
        """Sharded-batch loss grad == full-batch grad (XLA inserts the
        all-reduce, matching DDP)."""
        mesh = make_mesh()
        w = jnp.ones((4, 4))
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4))

        def loss(w, x):
            return ((x @ w) ** 2).mean()

        g_full = jax.grad(loss)(w, x)
        with mesh:
            ws = replicate(mesh, w)
            xs = shard_batch(mesh, x)
            g_sharded = jax.jit(jax.grad(loss))(ws, xs)
        np.testing.assert_allclose(g_full, g_sharded, atol=1e-6)

    def test_fsdp_train_math_matches_replicated(self):
        mesh = make_mesh()
        w = jax.random.normal(jax.random.PRNGKey(1), (64 * 1024,)).reshape(256, 256)
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 256))

        def loss(w, x):
            return jnp.tanh(x @ w).sum()

        g_ref = jax.grad(loss)(w, x)
        with mesh:
            wf = shard_params_fsdp(mesh, {"w": w}, min_size=1)["w"]
            xs = shard_batch(mesh, x)
            g = jax.jit(jax.grad(loss))(wf, xs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


class TestShardedRestore:
    def test_restore_onto_mesh(self, tmp_path):
        """restore_train_state(sharding=...) places each leaf straight on
        the mesh (replicated or FSDP-ruled) without a host-numpy bounce."""
        from jax.sharding import NamedSharding, PartitionSpec
        from vicasplat_tpu.utils.checkpointing import (
            CheckpointManager, restore_train_state,
        )

        mesh = make_mesh()
        params = {"big": jnp.arange(1024.0 * 16).reshape(1024, 16),
                  "small": jnp.arange(4.0)}
        opt_state = {"mu": jax.tree.map(jnp.zeros_like, params)}
        cm = CheckpointManager(tmp_path, every_n_steps=1)
        cm.save(7, jax.device_get(params), opt_state=jax.device_get(opt_state),
                extra={"step": np.asarray(7, np.int64)})
        cm.finalize()

        # replicated restore
        repl = NamedSharding(mesh, PartitionSpec())
        p, s, step = restore_train_state(cm.latest(), params, opt_state,
                                         sharding=repl)
        assert step == 7
        assert p["big"].sharding.is_fully_replicated
        np.testing.assert_allclose(np.asarray(p["big"]), np.asarray(params["big"]))
        np.testing.assert_allclose(np.asarray(s["mu"]["small"]), 0.0)

        # FSDP-style placement rule: shard large leaves on dim 0
        def rule(x):
            if x.ndim and x.shape[0] % 8 == 0 and x.size >= 1024:
                return NamedSharding(mesh, PartitionSpec("data"))
            return repl

        p2, _, _ = restore_train_state(cm.latest(), params, opt_state,
                                       sharding=rule)
        assert not p2["big"].sharding.is_fully_replicated
        assert p2["big"].addressable_shards[0].data.shape == (128, 16)
        assert p2["small"].sharding.is_fully_replicated
        np.testing.assert_allclose(np.asarray(p2["big"]),
                                   np.asarray(params["big"]))


class TestTensorParallel:
    """Megatron-style TP over a ("data","model") mesh: parameter shardings
    alone (XLA SPMD propagation) must reproduce the replicated forward."""

    def _setup(self):
        import vicasplat_tpu.models.vicanet as VN
        from vicasplat_tpu.parallel.tp import make_mesh_2d, shard_params_tp

        bb = VN.VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
            use_flash_attention=False,
        )
        params = VN.init_vicanet(jax.random.PRNGKey(0), bb)
        mesh = make_mesh_2d(2, 4)
        return VN, bb, params, mesh, shard_params_tp

    def test_tp_sharding_placement(self):
        VN, bb, params, mesh, shard_params_tp = self._setup()
        sp = shard_params_tp(mesh, params)
        qkv = sp["enc_blocks"]["attn"]["qkv"]["w"]       # (L, 64, 192)
        assert qkv.addressable_shards[0].data.shape[-1] == 192 // 4
        proj = sp["enc_blocks"]["attn"]["proj"]["w"]     # (L, 64, 64)
        assert proj.addressable_shards[0].data.shape[-2] == 64 // 4
        assert sp["enc_norm"]["scale"].sharding.is_fully_replicated

    def test_tp_forward_matches_replicated(self):
        VN, bb, params, mesh, shard_params_tp = self._setup()
        B, T, S = 1, 2, 32
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3)) * 2 - 1
        K = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (B, T, 3, 3))

        ref = jax.jit(
            lambda p: VN.vicanet_forward(p, bb, imgs, K, dtype=jnp.float32)[0]
        )(params)

        sp = shard_params_tp(mesh, params)
        with mesh:
            out = jax.jit(
                lambda p: VN.vicanet_forward(p, bb, imgs, K, dtype=jnp.float32)[0]
            )(sp)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4
        )


class TestSequenceParallel:
    """Megatron-style SP over a ("data","seq") mesh: tokens-over-"seq"
    activation constraints at the block boundaries (parallel/sp.py) must
    reproduce the unsharded forward — GSPMD inserts the K/V all-gathers."""

    def _setup(self, n_data, n_seq):
        import vicasplat_tpu.models.vicanet as VN
        from vicasplat_tpu.parallel.sp import make_mesh_sp

        bb = VN.VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=2,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=2, dec_num_heads=4,
            use_flash_attention=False,
        )
        params = VN.init_vicanet(jax.random.PRNGKey(0), bb)
        return VN, bb, params, make_mesh_sp(n_data, n_seq)

    def _check(self, n_data, n_seq, B):
        VN, bb, params, mesh = self._setup(n_data, n_seq)
        T, S = 2, 32
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3)) * 2 - 1
        K = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (B, T, 3, 3))

        ref_fn = jax.jit(
            lambda p: VN.vicanet_forward(p, bb, imgs, K, dtype=jnp.float32)
        )
        sp_fn = jax.jit(
            lambda p: VN.vicanet_forward(p, bb, imgs, K, dtype=jnp.float32,
                                         sp_mesh=mesh)
        )
        ref, got = ref_fn(params), sp_fn(params)
        # final tokens, camera extrinsic tokens, every DPT intermediate
        for r, g in zip(
            [ref[0], ref[1]] + list(ref[3]), [got[0], got[1]] + list(got[3])
        ):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-4, rtol=1e-4
            )

    def test_sp_forward_matches_unsharded(self):
        # pure SP: 1x8 — the 4-patch token axis shards unevenly (GSPMD pads)
        self._check(1, 8, B=1)

    def test_sp_composes_with_dp(self):
        # 2-way data x 4-way sequence on the same mesh
        self._check(2, 4, B=2)

    def test_sp_forces_einsum_attention(self):
        # flash-attention configs silently fall back to the einsum path
        # under SP (the Pallas kernel has no shard_map wrapper)
        import vicasplat_tpu.models.vicanet as VN
        from vicasplat_tpu.parallel.sp import make_mesh_sp

        bb = VN.VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=1,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=1, dec_num_heads=4,
            use_flash_attention=True,
        )
        params = VN.init_vicanet(jax.random.PRNGKey(0), bb)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 3))
        K = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
        out = jax.jit(
            lambda p: VN.vicanet_forward(p, bb, imgs, K, dtype=jnp.float32,
                                         sp_mesh=make_mesh_sp(1, 8))[0]
        )(params)
        assert np.isfinite(np.asarray(out)).all()


class TestViewParallel:
    """View-sharded trajectory rendering (parallel/view_parallel.py) must
    reproduce the serial decoder_forward exactly — only the view loop is
    distributed, the per-view math is identical."""

    def _scene(self, n=257, v=12):
        key = jax.random.PRNGKey(3)
        ks = jax.random.split(key, 8)
        from vicasplat_tpu.models.adapter import Gaussians

        means = jax.random.normal(ks[0], (1, n, 3)) * 0.5 + jnp.array(
            [0.0, 0.0, 3.0]
        )
        scales = jax.random.uniform(ks[1], (1, n, 3), minval=0.01, maxval=0.08)
        rots = jax.random.normal(ks[2], (1, n, 4))
        rots = rots / jnp.linalg.norm(rots, axis=-1, keepdims=True)
        sh = jax.random.normal(ks[3], (1, n, 3, 4)) * 0.3
        op = jax.nn.sigmoid(jax.random.normal(ks[4], (1, n)))
        g = Gaussians(
            means=means, covariances=None, harmonics=sh, opacities=op,
            scales=scales, rotations=rots,
        )
        angles = jnp.linspace(-0.2, 0.2, v)
        exts = []
        for a in angles:
            c, s = jnp.cos(a), jnp.sin(a)
            m = jnp.array(
                [[c, 0, s, 0.1 * a], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]]
            )
            exts.append(m)
        ext = jnp.stack(exts)[None]
        K = jnp.broadcast_to(
            jnp.array([[1.2, 0.0, 0.5], [0.0, 1.2, 0.5], [0.0, 0.0, 1.0]]),
            (1, v, 3, 3),
        )
        near = jnp.full((1, v), 0.1)
        far = jnp.full((1, v), 100.0)
        return g, ext, K, near, far

    def _cfg(self):
        from vicasplat_tpu.decoder.splatting import DecoderSplattingConfig
        from vicasplat_tpu.ops.rasterize import RasterizeConfig

        return DecoderSplattingConfig(
            rasterize=RasterizeConfig(dup_hw=(2, 2), max_per_tile=64, chunk=64)
        )

    def test_matches_serial_divisible(self):
        from vicasplat_tpu.decoder.splatting import decoder_forward
        from vicasplat_tpu.parallel import (
            decoder_forward_view_sharded, make_mesh,
        )

        cfg = self._cfg()
        g, ext, K, near, far = self._scene(v=16)  # 16 % 8 == 0
        mesh = make_mesh()
        ref = jax.jit(
            lambda *a: decoder_forward(cfg, *a, (32, 32))
        )(g, ext, K, near, far)
        got = jax.jit(
            lambda *a: decoder_forward_view_sharded(
                cfg, *a, (32, 32), mesh=mesh
            )
        )(g, ext, K, near, far)
        for r, o in zip(ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=1e-5)

    def test_matches_serial_with_padding(self):
        from vicasplat_tpu.decoder.splatting import decoder_forward
        from vicasplat_tpu.parallel import (
            decoder_forward_view_sharded, make_mesh,
        )

        cfg = self._cfg()
        g, ext, K, near, far = self._scene(v=12)  # 12 % 8 != 0 -> pads to 16
        mesh = make_mesh()
        ref = jax.jit(
            lambda *a: decoder_forward(cfg, *a, (32, 32))
        )(g, ext, K, near, far)
        got = jax.jit(
            lambda *a: decoder_forward_view_sharded(
                cfg, *a, (32, 32), mesh=mesh
            )
        )(g, ext, K, near, far)
        assert got.color.shape == ref.color.shape
        for r, o in zip(ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=1e-5)

    def test_matches_serial_scale_invariant(self):
        import dataclasses

        from vicasplat_tpu.decoder.splatting import decoder_forward
        from vicasplat_tpu.parallel import (
            decoder_forward_view_sharded, make_mesh,
        )

        cfg = dataclasses.replace(self._cfg(), make_scale_invariant=True)
        g, ext, K, near, far = self._scene(v=16)
        near = near * 0.37  # non-unit global scale
        mesh = make_mesh()
        ref = jax.jit(
            lambda *a: decoder_forward(cfg, *a, (32, 32))
        )(g, ext, K, near, far)
        got = jax.jit(
            lambda *a: decoder_forward_view_sharded(
                cfg, *a, (32, 32), mesh=mesh
            )
        )(g, ext, K, near, far)
        for r, o in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(r), np.asarray(o), atol=5e-4)


class TestPipelineParallel:
    """GPipe pipeline over stacked blocks (parallel/pp.py) vs the serial
    lax.scan it replaces."""

    @staticmethod
    def _toy(L=16, C=32):
        k = jax.random.PRNGKey(0)
        kw, kb, kx = jax.random.split(k, 3)
        blocks = {
            "w": jax.random.normal(kw, (L, C, C)) * (0.5 / np.sqrt(C)),
            "b": jax.random.normal(kb, (L, C)) * 0.1,
        }
        x = jax.random.normal(kx, (8, 5, C))

        def block_fn(h, blk):
            return jnp.tanh(h @ blk["w"] + blk["b"])

        return block_fn, blocks, x

    def test_matches_serial_scan(self):
        from vicasplat_tpu.parallel import make_mesh_pipe, pipeline_scan

        block_fn, blocks, x = self._toy()
        mesh = make_mesh_pipe()  # 8 stages, 2 blocks each

        def serial(blocks, x):
            return jax.lax.scan(
                lambda h, blk: (block_fn(h, blk), None), x, blocks)[0]

        ref = jax.jit(serial)(blocks, x)
        for n_micro in (2, 4, 8):
            got = jax.jit(
                lambda b, xx, m=n_micro: pipeline_scan(
                    block_fn, b, xx, mesh, n_micro=m)
            )(blocks, x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=1e-6,
                err_msg=f"n_micro={n_micro}")

    def test_grads_match_serial(self):
        from vicasplat_tpu.parallel import make_mesh_pipe, pipeline_scan

        block_fn, blocks, x = self._toy(L=8, C=16)
        mesh = make_mesh_pipe()
        tgt = jnp.ones_like(x)

        def serial_loss(blocks, x):
            out = jax.lax.scan(
                lambda h, blk: (block_fn(h, blk), None), x, blocks)[0]
            return ((out - tgt) ** 2).mean()

        def pp_loss(blocks, x):
            out = pipeline_scan(block_fn, blocks, x, mesh, n_micro=4)
            return ((out - tgt) ** 2).mean()

        ref = jax.jit(jax.grad(serial_loss, argnums=(0, 1)))(blocks, x)
        got = jax.jit(jax.grad(pp_loss, argnums=(0, 1)))(blocks, x)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-6)

    def test_sharded_params_placement(self):
        from vicasplat_tpu.parallel import (
            make_mesh_pipe, pipeline_scan, shard_params_pp,
        )

        block_fn, blocks, x = self._toy()
        mesh = make_mesh_pipe()
        sharded = shard_params_pp(mesh, blocks)
        # stage-local shard holds L/S blocks
        assert sharded["w"].addressable_shards[0].data.shape[0] == 2
        got = jax.jit(
            lambda b, xx: pipeline_scan(block_fn, b, xx, mesh, n_micro=4)
        )(sharded, x)

        def serial(blocks, x):
            return jax.lax.scan(
                lambda h, blk: (block_fn(h, blk), None), x, blocks)[0]

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jax.jit(serial)(blocks, x)),
            atol=1e-6)

    def test_encoder_blocks_pipelined(self):
        """Real VicaNet encoder blocks through the pipeline == the encoder's
        own lax.scan (models/vicanet.py)."""
        from vicasplat_tpu.models.vicanet import (
            VicaNetConfig, _enc_block_init, _spatial_rope_tables,
            _enc_block_apply,
        )
        from vicasplat_tpu.parallel import make_mesh_pipe, pipeline_scan

        cfg = VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=8,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
        )
        keys = jax.random.split(jax.random.PRNGKey(0), cfg.enc_depth)
        blocks = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_enc_block_init(k, cfg) for k in keys],
        )
        cos, sin = _spatial_rope_tables(cfg, cfg.enc_head_dim, (2, 2))
        # tables cover n_patches + the intrinsic token
        x = jax.random.normal(jax.random.PRNGKey(1), (8, cos.shape[0], 64))

        def block_fn(h, blk):
            return _enc_block_apply(
                blk, h, cos, sin, cfg.enc_num_heads, jnp.float32)

        def serial(blocks, x):
            return jax.lax.scan(
                lambda h, blk: (block_fn(h, blk), None), x, blocks)[0]

        mesh = make_mesh_pipe()
        ref = jax.jit(serial)(blocks, x)
        got = jax.jit(
            lambda b, xx: pipeline_scan(block_fn, b, xx, mesh, n_micro=4)
        )(blocks, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_vicanet_forward_pipelined(self):
        """vicanet_forward(pipeline_mesh=...) == the serial forward; the
        B*T frame axis supplies the microbatches."""
        from vicasplat_tpu.models.vicanet import (
            VicaNetConfig, init_vicanet, vicanet_forward,
        )
        from vicasplat_tpu.parallel import make_mesh_pipe

        cfg = VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=8,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=4, dec_num_heads=4,
        )
        params = init_vicanet(jax.random.PRNGKey(0), cfg)
        B, T = 2, 4  # B*T = 8 microbatch-able frames
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (B, T, 32, 32, 3)) * 2 - 1
        K = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (B, T, 3, 3))
        mesh = make_mesh_pipe()
        ref = jax.jit(
            lambda p: vicanet_forward(p, cfg, imgs, K, dtype=jnp.float32)
        )(params)
        got = jax.jit(
            lambda p: vicanet_forward(p, cfg, imgs, K, dtype=jnp.float32,
                                      pipeline_mesh=mesh)
        )(params)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-5)

    def test_pp_composes_with_dp(self):
        """4 pipeline stages x 2 data shards on a 2-D mesh == serial."""
        from vicasplat_tpu.parallel import make_mesh_pipe_data, pipeline_scan

        block_fn, blocks, x = self._toy(L=8, C=16)  # x: (8, 5, 16)
        mesh = make_mesh_pipe_data(4, 2)

        def serial(blocks, x):
            return jax.lax.scan(
                lambda h, blk: (block_fn(h, blk), None), x, blocks)[0]

        ref = jax.jit(serial)(blocks, x)
        got = jax.jit(
            lambda b, xx: pipeline_scan(
                block_fn, b, xx, mesh, n_micro=2, data_axis="data")
        )(blocks, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)

    def test_grads_match_with_remat_blocks(self):
        """jax.checkpoint-wrapped block_fn composes with the pipeline (the
        training configuration: remat inside, pipeline outside)."""
        from vicasplat_tpu.parallel import make_mesh_pipe, pipeline_scan

        block_fn, blocks, x = self._toy(L=8, C=16)
        ck_block = jax.checkpoint(block_fn)
        mesh = make_mesh_pipe()

        def serial_loss(blocks, x):
            out = jax.lax.scan(
                lambda h, blk: (ck_block(h, blk), None), x, blocks)[0]
            return (out ** 2).mean()

        def pp_loss(blocks, x):
            out = pipeline_scan(ck_block, blocks, x, mesh, n_micro=4)
            return (out ** 2).mean()

        ref = jax.jit(jax.grad(serial_loss))(blocks, x)
        got = jax.jit(jax.grad(pp_loss))(blocks, x)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-6)

    def test_tuple_carry_and_collected_outputs(self):
        """Pytree carries + collect_outputs: per-block ys come back in
        serial block order (the decoder-hook contract)."""
        from vicasplat_tpu.parallel import make_mesh_pipe, pipeline_scan

        L, C = 8, 16
        k = jax.random.PRNGKey(0)
        kw, kb, kx, ky = jax.random.split(k, 4)
        blocks = {
            "w": jax.random.normal(kw, (L, C, C)) * (0.5 / np.sqrt(C)),
            "b": jax.random.normal(kb, (L, C)) * 0.1,
        }
        a = jax.random.normal(kx, (8, 5, C))
        c = jax.random.normal(ky, (8, C))

        def block_fn(carry, blk):
            a, c = carry
            a = jnp.tanh(a @ blk["w"] + blk["b"])
            c = jnp.tanh(c @ blk["w"])
            return (a, c), a  # per-block output = the img-like leaf

        def serial(blocks, a, c):
            return jax.lax.scan(block_fn, (a, c), blocks)

        ref_carry, ref_ys = jax.jit(serial)(blocks, a, c)
        mesh = make_mesh_pipe()
        got_carry, got_ys = jax.jit(
            lambda b, aa, cc: pipeline_scan(
                block_fn, b, (aa, cc), mesh, n_micro=4,
                collect_outputs=True)
        )(blocks, a, c)
        # serial scan stacks ys as (L, B, ...); pipeline must match
        np.testing.assert_allclose(np.asarray(got_ys), np.asarray(ref_ys),
                                   atol=1e-6)
        for r, g in zip(ref_carry, got_carry):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-6)

    def test_vicanet_decoder_pipelined(self):
        """Full vicanet_forward with BOTH stacks pipelined (4 stages;
        enc/dec depths divisible) == serial, including the DPT hook
        intermediates."""
        from vicasplat_tpu.models.vicanet import (
            VicaNetConfig, init_vicanet, vicanet_forward,
        )
        from vicasplat_tpu.parallel import make_mesh_pipe

        cfg = VicaNetConfig(
            img_size=32, patch_size=16, enc_embed_dim=64, enc_depth=8,
            enc_num_heads=4, dec_embed_dim=48, dec_depth=8, dec_num_heads=4,
        )
        params = init_vicanet(jax.random.PRNGKey(0), cfg)
        B, T = 2, 4
        imgs = jax.random.uniform(
            jax.random.PRNGKey(1), (B, T, 32, 32, 3)) * 2 - 1
        K = jnp.broadcast_to(
            jnp.array([[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]),
            (B, T, 3, 3))
        mesh = make_mesh_pipe(4)
        ref = jax.jit(
            lambda p: vicanet_forward(p, cfg, imgs, K, dtype=jnp.float32)
        )(params)
        got = jax.jit(
            lambda p: vicanet_forward(p, cfg, imgs, K, dtype=jnp.float32,
                                      pipeline_mesh=mesh)
        )(params)
        for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=1e-5)


class TestAccumulationOnMesh:
    def test_sharded_accumulated_step_matches_unsharded(self):
        """Grad accumulation composes with the DP mesh: the (A, B/A) reshape
        of a device-sharded batch dim re-shards per microbatch, and the
        shard_map'ed render needs each microbatch to still divide over the
        mesh (B=4, A=2 -> micro 2 over a 2-device mesh; kept small for the
        1-core CPU host)."""
        import dataclasses

        import optax

        from tests.test_training import tiny_batch, tiny_train_cfg
        from vicasplat_tpu.models import init_vicasplat
        from vicasplat_tpu.training import make_train_step

        cfg = dataclasses.replace(tiny_train_cfg(), accumulate_steps=2)
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        # SGD, not Adam: post-step params then differ by exactly lr*d(grad),
        # so the assertion bounds the GRAD mismatch instead of Adam's
        # noise-amplified m/sqrt(v) of near-zero-variance elements
        optimizer = optax.sgd(1e-3)
        batch = tiny_batch(jax.random.PRNGKey(1), B=4)

        step_plain = jax.jit(make_train_step(cfg, optimizer))
        p_ref, _, logs_ref = step_plain(params, optimizer.init(params),
                                        batch, 0)

        mesh = make_mesh(2)
        with mesh:
            step_mesh = jax.jit(make_train_step(cfg, optimizer, mesh=mesh))
            ps = replicate(mesh, params)
            ss = replicate(mesh, optimizer.init(params))
            bs = shard_batch(mesh, batch)
            p_m, _, logs_m = step_mesh(ps, ss, bs, 0)

        np.testing.assert_allclose(float(logs_m["loss"]),
                                   float(logs_ref["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(logs_m["grad_norm"]),
                                   float(logs_ref["grad_norm"]), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_m)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestPipelineTrainStep:
    def test_pp_dp_train_step_matches_serial(self):
        """The FULL train step with pipeline_mesh (PP-4 x DP-2, stacked
        blocks stage-sharded, batch data-sharded) matches the plain serial
        step: same loss, same updated params (the memory-proof
        configuration, parallel/memory_proof.py)."""
        import dataclasses

        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tests.test_training import tiny_batch, tiny_train_cfg
        from vicasplat_tpu.models import init_vicasplat
        from vicasplat_tpu.parallel import make_mesh_pipe_data
        from vicasplat_tpu.training import make_train_step

        cfg = tiny_train_cfg()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, backbone=dataclasses.replace(
                    cfg.model.backbone, enc_depth=4)))
        params = init_vicasplat(jax.random.PRNGKey(0), cfg.model)
        optimizer = optax.sgd(1e-3)
        batch = tiny_batch(jax.random.PRNGKey(1), B=4)

        step_plain = jax.jit(make_train_step(cfg, optimizer))
        p_ref, _, logs_ref = step_plain(params, optimizer.init(params),
                                        batch, 0)

        mesh = make_mesh_pipe_data(4, 2)

        def put_params(tree):
            def one(path, x):
                names = [getattr(k, "key", "") for k in path]
                if any(n in ("enc_blocks", "dec_blocks") for n in names):
                    return jax.device_put(
                        x, NamedSharding(
                            mesh, P("pipe", *([None] * (x.ndim - 1)))))
                return jax.device_put(x, NamedSharding(mesh, P()))

            return jax.tree_util.tree_map_with_path(one, tree)

        with mesh:
            step_pp = jax.jit(
                make_train_step(cfg, optimizer, mesh=mesh,
                                pipeline_mesh=mesh))
            ps = put_params(params)
            ss = put_params(optimizer.init(params))
            bs = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(
                        mesh, P("data", *([None] * (x.ndim - 1))))), batch)
            p_pp, _, logs_pp = step_pp(ps, ss, bs, 0)

        np.testing.assert_allclose(float(logs_pp["loss"]),
                                   float(logs_ref["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_pp)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-6)
