"""PerceiverIO voxel-language Q-network, flax/TPU-native.

Behavioral counterpart of ``PerceiverVoxelLangEncoder``
(peract/agents/peract_bc/perceiver_lang_io.py:136-485) and the two-arm
``PerceiverVoxelLang2RobotsEncoder`` (:488-860) — one module covers both via
``num_proprio`` / ``two_arm_heads`` (the reference duplicates ~370 lines per variant).

Shape walk at N=100, patch 5/5 (mirrors reference comments :357-:465):

  voxel grid [B,100,100,100,10] --1x1x1 conv--> d0 [B,...,64]
    --5^3/s5 patchify--> [B,20,20,20,64]
    --+tiled proprio (x1 or x2)--> [B,20,20,20,128|192]
    --flatten + prepend 77 CLIP token embs + learned pos enc--> [B,8077,128|192]
    --cross-attn into `num_latents` latents, `depth` self-attn layers-->
    --decoder cross-attn back onto the input sequence--> [B,8000,128|192]
    --reshape + x5 trilinear upsample + skip-concat d0--> u [B,100^3,64]
    --1ch conv3d--> Q_trans; MLP heads off (spatial-softmax || global-max) features.

TPU notes: channels-last NDHWC everywhere; attention shapes (latents 2048 x dim 512,
heads 8 x 64) are MXU-aligned; ``dtype=bfloat16`` flips all matmul/conv compute to bf16
while keeping f32 params and f32 softmax/spatial-softmax accumulation.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from voxactb_tpu.models.blocks import (
    Conv3D,
    Conv3DUpsample,
    DenseBlock,
    softargmax_stats_3d,
)


class Attention(nn.Module):
    """Multi-head attention, queries from ``x``, keys/values from ``context``.

    Mirrors perceiver_lang_io.py:93-132: no-bias q/kv projections, biased output
    projection, post-softmax dropout. Softmax runs in f32 regardless of compute dtype.
    """

    heads: int
    dim_head: int
    out_dim: int
    dropout: float = 0.0
    flash: bool = False          # pallas kernel: logits never hit HBM
    flash_train: bool = False    # custom-VJP flash kernel + in-kernel dropout
    flash_interpret: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        context = x if context is None else context
        inner = self.heads * self.dim_head

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head ** -0.5

        # inference fast path: the einsum below materializes f32
        # [B, heads, Tq, Tk] logits in HBM (1 GB/layer at batch 8, 100^3);
        # the flash kernel keeps each q-block's logit rows in VMEM
        use_flash = (self.flash and deterministic
                     and not self.is_initializing()
                     and self.dtype == jnp.bfloat16)
        # training fast path: custom-VJP kernel — neither the forward nor the
        # backward materializes the [B,H,Tq,Tk] probabilities (the dominant
        # HBM term of the train step's measured 3:1 bwd/fwd ratio); dropout
        # runs in-kernel from a counter-based mask
        use_flash_train = (self.flash_train and not deterministic
                           and not self.is_initializing()
                           and self.dtype == jnp.bfloat16)
        if use_flash or use_flash_train:
            b, h, n, d = q.shape
            flat = lambda t: t.reshape(b * h, t.shape[2], d)
            if use_flash:
                from voxactb_tpu.ops.pallas.flash_attention import (
                    flash_attention,
                )

                out = flash_attention(flat(q * scale), flat(k), flat(v),
                                      interpret=self.flash_interpret)
            else:
                from voxactb_tpu.ops.pallas.flash_attention import (
                    flash_attention_train,
                )

                if self.dropout > 0.0:
                    seed = jax.random.bits(self.make_rng("dropout"), (),
                                           jnp.uint32)
                else:
                    seed = jnp.zeros((), jnp.uint32)
                out = flash_attention_train(
                    flat(q * scale), flat(k), flat(v), seed,
                    dropout=self.dropout, interpret=self.flash_interpret)
            out = out.reshape(b, h, n, d)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", q, k,
                             preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(sim * scale, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhij,bhjd->bhid", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d).astype(self.dtype)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(out)


class PreNormAttention(nn.Module):
    """LayerNorm(x) [+ LayerNorm(context)] -> Attention (perceiver_lang_io.py:56-71)."""

    heads: int
    dim_head: int
    out_dim: int
    dropout: float = 0.0
    norm_context: bool = False
    flash: bool = False
    flash_train: bool = False
    flash_interpret: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if context is not None and self.norm_context:
            context = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_context")(context)
        return Attention(
            self.heads, self.dim_head, self.out_dim, self.dropout,
            flash=self.flash, flash_train=self.flash_train,
            flash_interpret=self.flash_interpret,
            dtype=self.dtype, name="attn",
        )(y, context, deterministic=deterministic)


class FeedForward(nn.Module):
    """PreNorm GEGLU MLP: dim -> dim*mult (gated) -> dim (perceiver_lang_io.py:74-90)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype, name="w_in")(y)
        y, gates = jnp.split(y, 2, axis=-1)
        y = y * jax.nn.gelu(gates)
        return nn.Dense(self.dim, dtype=self.dtype, name="w_out")(y)


class PerceiverVoxelLangEncoder(nn.Module):
    """Voxel-grid + language + proprio -> Q values for trans/rot/grip/collision.

    Set ``num_proprio=2, two_arm_heads=True`` for the 'one_policy_more_heads' variant
    (separate right/left decoder heads, shared trunk); ``arm_pred=True`` adds the
    acting/stabilizing arm-ID head used by VoxAct-B's ``arm_pred_loss``
    (perceiver_lang_io.py:330-334, :479-483).
    """

    depth: int = 6
    iterations: int = 1
    voxel_size: int = 100
    initial_dim: int = 10
    low_dim_size: int = 4
    num_rotation_classes: int = 72
    num_grip_classes: int = 2
    num_collision_classes: int = 2
    num_latents: int = 2048
    im_channels: int = 64
    latent_dim: int = 512
    cross_heads: int = 1
    latent_heads: int = 8
    cross_dim_head: int = 64
    latent_dim_head: int = 64
    activation: str = "lrelu"
    input_dropout: float = 0.1
    attn_dropout: float = 0.1
    decoder_dropout: float = 0.0
    voxel_patch_size: int = 5
    voxel_patch_stride: int = 5
    final_dim: int = 64
    lang_emb_dim: int = 512
    lang_max_seq_len: int = 77
    no_skip_connection: bool = False
    no_perceiver: bool = False
    no_language: bool = False
    arm_pred: bool = False
    num_proprio: int = 1
    two_arm_heads: bool = False
    fused_upsample: bool = True  # phase-decomposed upsample-conv (ops/upsample_conv)
    pallas_stats: bool = False   # fused softargmax+maxpool kernel (TPU only)
    zshift_conv3d: bool = True   # decompose big stride-1 convs into 2D convs
    pallas_decoder: bool = False  # fused final+trans+stats decoder tail (TPU,
    # inference only — training always takes the differentiable XLA ops)
    pallas_decoder_v2c: bool = False  # K-concat z-accumulation tail schedule
    pallas_decoder_v3: bool = False  # inline-upsample decoder tail: u0 never
    # materializes in HBM (ops/pallas/decoder_head_v3.py). Wins on bandwidth-
    # starved parts; the XLA-upsample + v1/v2 tail can win on physical HBM.
    pallas_encoder: bool = False  # fused preprocess-conv + stats front (TPU,
    # inference only)
    pallas_interpret: bool = False  # run pallas kernels in interpret mode (CPU tests)
    pallas_attention: bool = False  # flash attention in the trunk (inference,
    # bf16): cross/self/decoder logits never materialize in HBM
    # (ops/pallas/flash_attention.py)
    pallas_attention_train: bool = False  # custom-VJP flash attention in
    # training (bf16): probabilities stay in VMEM through fwd AND bwd;
    # attn dropout runs in-kernel (flash_attention.flash_attention_train)
    dtype: jnp.dtype = jnp.float32

    def _stats(self, x):
        """(spatial-softargmax keypoints, global max) — one fused pass on TPU."""
        if self.pallas_stats:
            from voxactb_tpu.ops.pallas.stats_head import stats_head

            kp, gmax = stats_head(x)
            return kp, gmax
        return softargmax_stats_3d(x)

    @property
    def input_dim_before_seq(self) -> int:
        # voxel features + one proprio stream each (perceiver_lang_io.py:200, :550)
        return self.im_channels * (1 + self.num_proprio)

    @nn.compact
    def __call__(
        self,
        voxel_grid: jax.Array,          # [B, N, N, N, initial_dim], channels-last
        proprio: jax.Array,             # [B, low_dim_size] or [B, 2, low_dim_size]
        lang_goal_emb: jax.Array,       # [B, 1024] (unused in 'seq' fusion)
        lang_token_embs: jax.Array,     # [B, 77, lang_emb_dim]
        *,
        train: bool = False,
        front=None,
    ):
        """``front``, when given, is ``(d0, patch_tokens, kp0, gmax0)`` precomputed
        by the fully fused front kernel (ops/pallas/front_fused.py, driven from
        agents.qfunction.fused_front_inputs with THIS module's params); the dense
        voxel grid is then never materialized and ``voxel_grid`` may be a dummy
        [B, 1, 1, 1, initial_dim] tensor carrying only batch/channel sizes."""
        del lang_goal_emb  # 'seq' fusion conditions on token embeddings only
        deterministic = not train
        n = self.voxel_size
        b = voxel_grid.shape[0]
        spatial = n // self.voxel_patch_stride
        dim = self.input_dim_before_seq

        x_in = voxel_grid.astype(self.dtype)

        # 1x1x1 preprocess (perceiver_lang_io.py:357)
        use_fused_front = (
            self.pallas_encoder and not train and not self.is_initializing()
            and self.activation == "lrelu" and self.dtype == jnp.bfloat16
            and front is None
        )
        preprocess = Conv3D(self.im_channels, 1, 1, self.activation,
                            dtype=self.dtype, name="input_preprocess")
        patchify = Conv3D(self.im_channels, self.voxel_patch_size,
                          self.voxel_patch_stride, self.activation,
                          dtype=self.dtype, name="patchify")
        if front is not None and not self.is_initializing():
            # params still declared (identical tree); weights were consumed by the
            # external fused kernel
            preprocess(jnp.zeros((1, 1, 1, 1, x_in.shape[-1]), self.dtype),
                       return_params=True)
            patchify(jnp.zeros((1, 1, 1, 1, self.im_channels), self.dtype),
                     return_params=True)
            d0, ins, kp0, gmax0 = front
            d0 = d0.astype(self.dtype)
            ins = ins.astype(self.dtype)
        elif use_fused_front:
            from voxactb_tpu.ops.pallas.encoder_stats import encoder_stats

            k1, b1 = preprocess(
                jnp.zeros((1, 1, 1, 1, x_in.shape[-1]), self.dtype),
                return_params=True)
            d0, kp0, gmax0 = encoder_stats(
                x_in, jnp.asarray(k1)[0, 0, 0], jnp.asarray(b1).reshape(-1),
                interpret=self.pallas_interpret)
            ins = patchify(d0)
        else:
            d0 = preprocess(x_in)
            kp0, gmax0 = self._stats(d0)
            ins = patchify(d0)
        feats = [kp0, gmax0]

        # tile proprio stream(s) over the patch grid (perceiver_lang_io.py:370-373)
        if self.low_dim_size > 0:
            p = proprio.reshape(b, self.num_proprio, self.low_dim_size)
            p = DenseBlock(self.im_channels, self.activation, self.dtype,
                           name="proprio_preprocess")(p.astype(self.dtype))
            p = jnp.broadcast_to(
                p.reshape(b, 1, 1, 1, self.num_proprio * self.im_channels),
                (b, spatial, spatial, spatial, self.num_proprio * self.im_channels),
            )
            ins = jnp.concatenate([ins, p], axis=-1)  # [B,s,s,s,dim]

        ins = ins.reshape(b, spatial ** 3, dim)

        # prepend language tokens as a sequence (perceiver_lang_io.py:416-418)
        if self.no_language:
            lang_token_embs = jnp.zeros_like(lang_token_embs)
        l = nn.Dense(dim, dtype=self.dtype, name="lang_preprocess")(
            lang_token_embs.astype(self.dtype)
        )
        seq = jnp.concatenate([l, ins], axis=1)  # [B, 77 + s^3, dim]

        # learned positional encoding over the full sequence (perceiver_lang_io.py:206-209)
        pos = self.param(
            "pos_encoding",
            nn.initializers.normal(1.0),
            (1, self.lang_max_seq_len + spatial ** 3, dim),
        )
        seq = seq + pos.astype(self.dtype)

        # latent bottleneck (perceiver_lang_io.py:250, :425-437)
        latents = self.param(
            "latents", nn.initializers.normal(1.0), (self.num_latents, self.latent_dim)
        )
        x = jnp.broadcast_to(
            latents[None].astype(self.dtype), (b, self.num_latents, self.latent_dim)
        )

        cross_attn = PreNormAttention(
            self.cross_heads, self.cross_dim_head, self.latent_dim,
            self.input_dropout, norm_context=True,
            flash=self.pallas_attention,
            flash_train=self.pallas_attention_train,
            flash_interpret=self.pallas_interpret,
            dtype=self.dtype, name="cross_attend",
        )
        cross_ff = FeedForward(self.latent_dim, dtype=self.dtype, name="cross_ff")
        self_attns = [
            PreNormAttention(self.latent_heads, self.latent_dim_head, self.latent_dim,
                             self.attn_dropout, flash=self.pallas_attention,
                             flash_train=self.pallas_attention_train,
                             flash_interpret=self.pallas_interpret,
                             dtype=self.dtype, name=f"self_attn_{i}")
            for i in range(self.depth)
        ]
        self_ffs = [
            FeedForward(self.latent_dim, dtype=self.dtype, name=f"self_ff_{i}")
            for i in range(self.depth)
        ]

        for _ in range(self.iterations):
            x = cross_attn(x, seq, deterministic=deterministic) + x
            x = cross_ff(x) + x
            for sa, ff in zip(self_attns, self_ffs):
                x = sa(x, deterministic=deterministic) + x
                x = ff(x) + x

        # decoder cross-attention back onto the input sequence (perceiver_lang_io.py:440)
        decoded = PreNormAttention(
            self.cross_heads, self.cross_dim_head, dim, self.decoder_dropout,
            norm_context=True, flash=self.pallas_attention,
            flash_train=self.pallas_attention_train,
            flash_interpret=self.pallas_interpret,
            dtype=self.dtype, name="decoder_cross_attn",
        )(seq, x, deterministic=deterministic)

        # drop the language slots, back to a patch grid (perceiver_lang_io.py:443-448)
        grid = decoded[:, self.lang_max_seq_len:].reshape(
            b, spatial, spatial, spatial, dim
        )

        kp1, gmax1 = self._stats(grid)
        feats.extend([kp1, gmax1])

        # inference fast paths: the whole decoder tail (skip-concat conv +
        # lrelu + trans decoder(s) + soft-argmax stats) as ONE pallas kernel.
        # v3 additionally synthesizes the upsampled stream in-kernel from the
        # post-conv_in slab, so u0 never materializes in HBM. Training and
        # ablation variants keep the differentiable XLA ops below.
        tail_ok = (
            not train and not self.is_initializing()
            and not self.no_skip_connection and not self.no_perceiver
            and self.activation == "lrelu"
            and self.im_channels == self.final_dim  # kernel assumes equal halves
        )
        use_fused_tail_v3 = (self.pallas_decoder_v3 and tail_ok
                             and self.voxel_patch_stride == 5
                             and self.voxel_patch_size == 5)
        use_fused_tail = (self.pallas_decoder and tail_ok
                          and not use_fused_tail_v3)

        # upsample + skip connection + final conv (perceiver_lang_io.py:454-462)
        up0 = Conv3DUpsample(
            self.final_dim, self.voxel_patch_stride, self.voxel_patch_size,
            self.activation, fast=self.fused_upsample, dtype=self.dtype,
            name="up0",
        )
        if use_fused_tail_v3:
            h_slab, up_kernel, up_bias = up0(grid, pre_only=True)
            u0 = None
        else:
            u0 = up0(grid)

        final_conv = Conv3D(self.im_channels, 3, 1, self.activation,
                            zshift_2d=self.zshift_conv3d, dtype=self.dtype, name="final")

        out = {}
        if use_fused_tail or use_fused_tail_v3:
            # v2 schedule is the default tail kernel: argmax-identical to v1 on
            # chip and faster (tools/probe_decoder_ab.py); v1 stays as the
            # reference implementation the test suite cross-checks against.
            # v2c folds the z-accumulation into the MXU (K-concat) — parity in
            # tests/test_decoder_v2.py, gated until the on-chip paired A/B.
            if self.pallas_decoder_v2c:
                from voxactb_tpu.ops.pallas.decoder_head_v2c import (
                    decoder_head_v2c as decoder_head,
                )
            else:
                from voxactb_tpu.ops.pallas.decoder_head_v2 import (
                    decoder_head_v2 as decoder_head,
                )
            from voxactb_tpu.ops.pallas.decoder_head_v3 import decoder_head_v3

            dummy_cat = jnp.zeros(
                (1, 1, 1, 1, self.im_channels + self.final_dim), self.dtype)
            dummy_u = jnp.zeros((1, 1, 1, 1, self.im_channels), self.dtype)
            kf, bfb = final_conv(dummy_cat, return_params=True)
            head_names = (
                ["trans_decoder", "trans_decoder_left"] if self.two_arm_heads
                else ["trans_decoder"]
            )
            wt, bt = [], []
            for nm in head_names:
                k_i, b_i = Conv3D(1, 3, 1, None, zshift_2d=self.zshift_conv3d,
                                  dtype=self.dtype, name=nm)(
                    dummy_u, return_params=True)
                wt.append(k_i)
                bt.append(b_i)
            if use_fused_tail_v3:
                trans_all, kp_u, gmax_u = decoder_head_v3(
                    d0, h_slab, jnp.asarray(up_kernel), jnp.asarray(up_bias),
                    kf, jnp.asarray(bfb).reshape(-1),
                    jnp.stack(wt), jnp.concatenate(bt),
                    interpret=self.pallas_interpret,
                )
            else:
                trans_all, kp_u, gmax_u = decoder_head(
                    d0, u0, kf, jnp.asarray(bfb).reshape(-1),
                    jnp.stack(wt), jnp.concatenate(bt),
                    interpret=self.pallas_interpret,
                )
            u = None
            fused_ustats = (kp_u, gmax_u)
        else:
            if self.no_skip_connection:
                u = final_conv(u0)
            elif self.no_perceiver:
                u = final_conv(d0)
            else:
                u = final_conv(jnp.concatenate([d0, u0], axis=-1))
            fused_ustats = None

        def mlp_heads(suffix: str):
            """ss_final/maxpool features -> dense stack -> rot+grip+collision logits."""
            kpu, gmaxu = fused_ustats if fused_ustats is not None else self._stats(u)
            head_feats = feats + [kpu, gmaxu]
            cat = jnp.concatenate(head_feats, axis=1).astype(self.dtype)
            h0 = DenseBlock(256, self.activation, self.dtype, name=f"dense0{suffix}")(cat)
            h1 = DenseBlock(self.final_dim, self.activation, self.dtype,
                            name=f"dense1{suffix}")(h0)
            rgc = DenseBlock(
                self.num_rotation_classes * 3 + self.num_grip_classes
                + self.num_collision_classes,
                None, self.dtype, name=f"rot_grip_collision_ff{suffix}",
            )(h1)
            rot_grip = rgc[:, : -self.num_collision_classes].astype(jnp.float32)
            collision = rgc[:, -self.num_collision_classes:].astype(jnp.float32)
            return cat, rot_grip, collision

        if self.two_arm_heads:
            # right + left heads off the shared trunk (perceiver_lang_io.py:828-858).
            # NOTE the reference computes ss_final per arm; we mirror that by calling
            # mlp_heads twice (each call makes its own ss_final params via name scope).
            if use_fused_tail or use_fused_tail_v3:
                out["trans_right"] = trans_all[..., 0:1]
                out["trans_left"] = trans_all[..., 1:2]
            else:
                out["trans_right"] = Conv3D(
                    1, 3, 1, None, zshift_2d=self.zshift_conv3d, dtype=self.dtype,
                    name="trans_decoder")(u).astype(jnp.float32)
                out["trans_left"] = Conv3D(
                    1, 3, 1, None, zshift_2d=self.zshift_conv3d, dtype=self.dtype,
                    name="trans_decoder_left")(u).astype(jnp.float32)
            _, out["rot_grip_right"], out["collision_right"] = mlp_heads("")
            _, out["rot_grip_left"], out["collision_left"] = mlp_heads("_left")
        else:
            if use_fused_tail or use_fused_tail_v3:
                out["trans"] = trans_all
            else:
                out["trans"] = Conv3D(
                    1, 3, 1, None, zshift_2d=self.zshift_conv3d, dtype=self.dtype,
                    name="trans_decoder")(u).astype(jnp.float32)
            cat, out["rot_grip"], out["collision"] = mlp_heads("")
            if self.arm_pred:
                # arm-ID head (acting vs stabilizing), perceiver_lang_io.py:479-483
                h2 = DenseBlock(self.final_dim, self.activation, self.dtype,
                                name="dense2")(cat)
                out["arm"] = DenseBlock(2, None, self.dtype, name="arm_ff")(
                    h2
                ).astype(jnp.float32)

        return out
