"""Backbone plugins: GCNet context block, Non-Local block, and the
GeneralizedAttention ("empirical attention") module (all NHWC).

Parity references: /root/reference/mmdetection/mmdet/ops/context_block.py
(ContextBlock: attention-pooled global context -> channel add/mul term),
mmdet/models/plugins/non_local.py (embedded-gaussian NonLocal2D), and
mmdet/models/plugins/generalized_attention.py (4-term empirical attention
with sinusoidal relative-position embeddings and strided key/value maps).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """GCNet: global context via attention pooling + bottleneck transform."""
    ratio: float = 1.0 / 16
    pooling_type: str = 'att'        # 'att' | 'avg'
    fusion_types: Sequence[str] = ('channel_add',)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        planes = max(int(C * self.ratio), 1)

        if self.pooling_type == 'att':
            attn = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name='conv_mask')(x).reshape(B, H * W, 1)
            attn = nn.softmax(attn, axis=1)
            context = jnp.einsum('bpc,bpo->boc',
                                 x.reshape(B, H * W, C), attn)
            context = context.reshape(B, 1, 1, C)
        else:
            context = x.mean(axis=(1, 2), keepdims=True)

        out = x
        for fusion in self.fusion_types:
            if fusion not in ('channel_add', 'channel_mul'):
                raise ValueError(fusion)
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f'{fusion}_conv1')(context)
            t = nn.LayerNorm(dtype=self.dtype, name=f'{fusion}_ln')(t)
            t = nn.relu(t)
            t = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f'{fusion}_conv2')(t)
            if fusion == 'channel_add':
                out = out + t
            else:
                out = out * nn.sigmoid(t)
        return out


class GeneralizedAttention(nn.Module):
    """Empirical attention: the four-term generalized attention factorization
    (query.key, query.position, bias.key, bias.position), selected by the
    attention_type bit string, over strided key/value maps.

    TPU-native formulation: all terms are einsums over (head, pixel, dim)
    tensors; position embeddings are built with broadcasted iota instead of
    host loops; the spatial-range constraint is an on-the-fly window mask
    rather than the reference's precomputed byte map. Module/param names
    (query_conv/key_conv/value_conv/proj_conv/appr_geom_fc_x/appr_geom_fc_y/
    appr_bias/geom_bias/gamma) match the reference for checkpoint mapping.
    """
    num_heads: int = 9
    spatial_range: int = -1
    kv_stride: int = 2
    q_stride: int = 1
    attention_type: str = '1111'
    position_magnitude: float = 1.0
    position_embedding_dim: int = -1
    dtype: Any = jnp.float32

    def _pos_embedding(self, n_q, n_kv, q_stride, kv_stride, dim):
        """Sinusoidal embedding of strided coordinate differences:
        (n_q, n_kv, dim/2) with [sin | cos] halves (reference
        get_position_embedding)."""
        q_idx = jnp.arange(n_q, dtype=jnp.float32) * q_stride
        kv_idx = jnp.arange(n_kv, dtype=jnp.float32) * kv_stride
        diff = (q_idx[:, None] - kv_idx[None, :]) * self.position_magnitude
        feat_range = jnp.arange(dim // 4, dtype=jnp.float32)
        dim_mat = 1000.0 ** ((4.0 / dim) * feat_range)
        phase = diff[..., None] / dim_mat
        return jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        heads = self.num_heads
        d = C // heads
        at = [c == '1' for c in self.attention_type]
        pe_dim = (self.position_embedding_dim
                  if self.position_embedding_dim > 0 else C)

        x_q = x[:, ::self.q_stride, ::self.q_stride]
        x_kv = x[:, ::self.kv_stride, ::self.kv_stride]
        h, w = x_q.shape[1:3]
        hk, wk = x_kv.shape[1:3]

        dense = lambda n, use_bias=False: nn.Dense(
            heads * d, use_bias=use_bias,
            kernel_init=nn.initializers.variance_scaling(
                1.0, 'fan_in', 'uniform'),
            dtype=self.dtype, name=n)
        f32 = jnp.float32
        energy = jnp.zeros((B, heads, h, w, hk, wk), f32)

        if at[0] or at[1]:
            q = dense('query_conv')(x_q).reshape(B, h, w, heads, d)
            q = q.astype(f32)
        if at[0] or at[2]:
            k = dense('key_conv')(x_kv).reshape(B, hk, wk, heads, d)
            k = k.astype(f32)
        if at[2] or at[3]:
            stdv = 1.0 / math.sqrt(d * 2)
            init = nn.initializers.uniform(scale=2 * stdv)
        if at[2]:
            appr_bias = self.param('appr_bias',
                                   lambda kk, s: init(kk, s) - stdv,
                                   (heads * d,)).reshape(heads, d)
        if at[3]:
            geom_bias = self.param('geom_bias',
                                   lambda kk, s: init(kk, s) - stdv,
                                   (heads * d,)).reshape(heads, d)
        if at[1] or at[3]:
            emb_x = self._pos_embedding(w, wk, self.q_stride,
                                        self.kv_stride, pe_dim)
            emb_y = self._pos_embedding(h, hk, self.q_stride,
                                        self.kv_stride, pe_dim)
            pos_x = dense('appr_geom_fc_x')(emb_x).reshape(
                w, wk, heads, d).astype(f32) / math.sqrt(2)
            pos_y = dense('appr_geom_fc_y')(emb_y).reshape(
                h, hk, heads, d).astype(f32) / math.sqrt(2)

        if at[0]:
            qq = q + appr_bias[None, None, None] if at[2] else q
            energy += jnp.einsum('byxnd,bijnd->bnyxij', qq, k)
        elif at[2]:
            energy += jnp.einsum('nd,bijnd->bnij', appr_bias, k)[
                :, :, None, None]
        if at[1]:
            qg = q + geom_bias[None, None, None] if at[3] else q
            # x-term broadcasts over kv rows, y-term over kv columns
            energy += jnp.einsum('byxnd,xjnd->bnyxj', qg, pos_x)[
                :, :, :, :, None, :]
            energy += jnp.einsum('byxnd,yind->bnyxi', qg, pos_y)[
                ..., None]
        elif at[3]:
            energy += jnp.einsum('nd,xjnd->nxj', geom_bias, pos_x)[
                None, :, None, :, None, :]
            energy += jnp.einsum('nd,yind->nyi', geom_bias, pos_y)[
                None, :, :, None, :, None]

        if self.spatial_range >= 0:
            # query centers live at iy*q_stride/ix*q_stride in input space
            # (reference generalized_attention.py builds the local-constraint
            # map from h_idx * q_stride)
            iy = jnp.arange(h)[:, None, None, None] * self.q_stride
            ix = jnp.arange(w)[None, :, None, None] * self.q_stride
            ky = jnp.arange(hk)[None, None, :, None]
            kx = jnp.arange(wk)[None, None, None, :]
            sr, kvs = self.spatial_range, self.kv_stride
            ok = ((ky >= jnp.maximum((iy - sr) // kvs, 0))
                  & (ky < (iy + sr + 1) // kvs + 1)
                  & (kx >= jnp.maximum((ix - sr) // kvs, 0))
                  & (kx < (ix + sr + 1) // kvs + 1))
            energy = jnp.where(ok[None, None], energy, -jnp.inf)

        attn = jax.nn.softmax(
            energy.reshape(B, heads, h * w, hk * wk), axis=-1)
        v = dense('value_conv')(x_kv).reshape(
            B, hk * wk, heads, d).astype(f32)
        # heads * d can be < C when C % num_heads != 0 (reference v_dim)
        out = jnp.einsum('bnpq,bqnd->bpnd', attn, v).reshape(
            B, h, w, heads * d)
        out = nn.Dense(C, use_bias=True,
                       kernel_init=nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'uniform'),
                       dtype=self.dtype, name='proj_conv')(
                           out.astype(x.dtype))
        gamma = self.param('gamma', nn.initializers.zeros, (1,))
        return gamma.astype(x.dtype) * out + x


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block."""
    reduction: int = 2
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = max(C // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name='theta')(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name='phi')(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name='g')(x)
        P = H * W
        theta = theta.reshape(B, P, inter)
        phi = phi.reshape(B, P, inter)
        g = g.reshape(B, P, inter)
        attn = jnp.einsum('bpc,bqc->bpq', theta, phi,
                          preferred_element_type=jnp.float32)
        if self.use_scale:
            attn = attn / jnp.sqrt(float(inter))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum('bpq,bqc->bpc', attn, g).reshape(B, H, W, inter)
        y = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name='conv_out')(y)
        return x + y
