"""GPD baseline classifier: LeNet-style CNN on 60x60 projection images.

Re-design of the reference GPD baseline (reference: PointNetGPD/model/gpd.py:5-31)
in functional JAX, channels-last NHWC (TPU-native conv layout). Structure:
Conv(C->20, 5x5, valid) -> maxpool 2x2 -> Conv(20->50, 5x5, valid) -> maxpool 2x2
-> FC(7200->500) -> ReLU [-> dropout p=0.5] -> FC(500->2) -> log_softmax.

Note the reference applies *no* activation between conv and pool (a quirk of
the original; reproduced here — see gpd.py:22-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import init_linear


def init_conv2d(key, in_chann: int, out_chann: int, ksize: int, dtype=jnp.float32):
    """Torch-default Conv2d init: U(+-1/sqrt(fan_in)), fan_in = Cin*kh*kw."""
    kw_, kb = jax.random.split(key)
    fan_in = in_chann * ksize * ksize
    bound = 1.0 / (fan_in ** 0.5)
    return {
        # HWIO layout for lax.conv_general_dilated.
        "w": jax.random.uniform(kw_, (ksize, ksize, in_chann, out_chann), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_chann,), dtype, -bound, bound),
    }


def conv2d_valid(p, x):
    """x: (B, H, W, C) NHWC, valid padding, stride 1."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def maxpool2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def init_gpd_classifier(key, input_chann: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": init_conv2d(k1, input_chann, 20, 5, dtype),
        "conv2": init_conv2d(k2, 20, 50, 5, dtype),
        "fc1": init_linear(k3, 12 * 12 * 50, 500, dtype),
        "fc2": init_linear(k4, 500, 2, dtype),
    }


def apply_gpd_classifier(p, x, *, train: bool = False, dropout: bool = False,
                         rng=None):
    """x: (B, 60, 60, C) NHWC -> log_probs (B, 2). (ref: gpd.py:21-31)

    The flatten order matches torch's NCHW ``view(-1, 7200)`` so converted
    checkpoints reproduce the reference bit-for-bit: we transpose the pooled
    activations to NCHW before reshaping.
    """
    x = maxpool2x2(conv2d_valid(p["conv1"], x))
    x = maxpool2x2(conv2d_valid(p["conv2"], x))
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)  # NCHW flatten
    x = jax.nn.relu(jnp.matmul(x, p["fc1"]["w"].T) + p["fc1"]["b"])
    if dropout and train:
        assert rng is not None, "dropout in train mode needs an rng key"
        keep = jax.random.bernoulli(rng, 0.5, x.shape)
        x = jnp.where(keep, x / 0.5, 0.0)
    x = jnp.matmul(x, p["fc2"]["w"].T) + p["fc2"]["b"]
    return jax.nn.log_softmax(x, axis=-1)
