"""Parameter primitives: linear layers, MLPs and the LSTM cell.

Pure-functional pytree parameters (nested dicts of jnp arrays) — idiomatic for
`jax.lax.scan` recurrences and Pallas kernels.  Initialisation distributions
match the reference's torch defaults (uniform +-1/sqrt(fan_in) for Linear,
+-1/sqrt(hidden) for LSTMCell) so training dynamics are comparable.

Everything here is shape-polymorphic over leading batch dims: inputs are
``[..., features]``.
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True) -> Dict:
    k = 1.0 / jnp.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    params = {"w": jax.random.uniform(wkey, (in_dim, out_dim), minval=-k, maxval=k)}
    if bias:
        params["b"] = jax.random.uniform(bkey, (out_dim,), minval=-k, maxval=k)
    return params


def linear(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


def init_mlp(key, dims: Sequence[int]) -> List[Dict]:
    """Linear+ReLU stack; mirrors the reference's make_mlp
    (/root/reference/trajnetbaselines/sgan/sgan.py:34-44)."""
    keys = jax.random.split(key, len(dims) - 1)
    return [init_linear(k, i, o) for k, i, o in zip(keys, dims[:-1], dims[1:])]


def mlp(params: List[Dict], x: jnp.ndarray, final_relu: bool = True) -> jnp.ndarray:
    for i, layer in enumerate(params):
        x = linear(layer, x)
        if final_relu or i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def init_lstm_cell(key, in_dim: int, hidden_dim: int) -> Dict:
    """LSTM cell parameters, gate order (i, f, g, o)."""
    k = 1.0 / jnp.sqrt(hidden_dim)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, minval=-k, maxval=k)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden_dim)),
        "w_hh": u(k2, (hidden_dim, 4 * hidden_dim)),
        "b_ih": u(k3, (4 * hidden_dim,)),
        "b_hh": u(k4, (4 * hidden_dim,)),
    }


def lstm_cell(params: Dict, x: jnp.ndarray, hc: Tuple[jnp.ndarray, jnp.ndarray]):
    """One LSTM cell step over ``[..., features]`` inputs.

    The two input/recurrent matmuls are fused into one gate projection so XLA
    maps them onto a single MXU pass per operand.
    """
    h, c = hc
    gates = x @ params["w_ih"] + h @ params["w_hh"] + (params["b_ih"] + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new
