"""Parameter initializers matching the reference's torch semantics.

The reference initializes Conv3d with kaiming-normal(fan_out, relu) and
BatchNorm with weight=1/bias=0 (reference: models/mymodel.py:21-28,195-202);
Linear layers keep torch's default kaiming-uniform(a=sqrt(5)), which reduces
to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias.
"""

import jax.numpy as jnp
from flax import linen as nn
from jax import random

# Conv kernels: He normal computed over fan_out = out_ch * prod(kernel).
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_bias(fan_in):
    """torch Conv3d default bias init: U(+-1/sqrt(cin * prod(kernel))).
    (The reference re-initializes conv weights only; biases keep this
    default — reference: models/mymodel.py:21-25.)"""
    return torch_linear_bias(fan_in)
