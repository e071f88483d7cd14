"""Train state: parameters, two optimizers, mutable model state, EMA.

The checkpoint unit of the framework (the analog of Lightning's .ckpt:
state_dict + optimizers + callback states, SURVEY.md §5).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from rave_tpu.config import RaveConfig
from rave_tpu.train.schedules import gen_lr_schedule


@flax.struct.dataclass
class RaveTrainState:
    step: jax.Array  # scalar int32
    gen_params: Any
    dis_params: Any
    gen_opt: Any
    dis_opt: Any
    model_state: Dict[str, Any]  # batch_stats / codebook / buffers / adain
    ema_params: Optional[Any] = None


def make_optimizers(cfg: RaveConfig):
    """(gen_tx, dis_tx). The generator transform is LR-less
    (`scale_by_adam`): the LinearLR decay must be a function of the *global*
    step — the reference steps its scheduler once per batch including
    discriminator batches (rave/model.py:272-274) — so the train step
    applies `gen_lr_schedule(state.step)` itself rather than letting optax
    count generator-only updates."""
    t = cfg.train
    gen_tx = optax.scale_by_adam(b1=t.adam_b1, b2=t.adam_b2)
    dis_tx = optax.adam(learning_rate=t.dis_lr, b1=t.adam_b1, b2=t.adam_b2)
    return gen_tx, dis_tx


def create_train_state(
    cfg: RaveConfig,
    model,
    discriminator,
    rng: jax.Array,
    n_channels: int = 1,
    n_signal: Optional[int] = None,
) -> RaveTrainState:
    n_signal = n_signal or cfg.data.n_signal
    x = jnp.zeros((2, n_signal, n_channels), jnp.float32)
    r1, r2, r3 = jax.random.split(rng, 3)
    # jit the inits: eager init dispatches hundreds of individual ops
    # (one per conv), which is pathologically slow over remote TPUs.
    variables = jax.jit(model.init)({"params": r1, "noise": r2}, x)
    gen_params = variables["params"]
    model_state = {
        k: v for k, v in variables.items() if k not in ("params", "cache")
    }
    dis_params = jax.jit(discriminator.init)({"params": r3}, x)["params"]

    gen_tx, dis_tx = make_optimizers(cfg)
    ema = (
        jax.tree_util.tree_map(jnp.copy, gen_params)
        if cfg.train.ema is not None
        else None
    )
    return RaveTrainState(
        step=jnp.asarray(0, jnp.int32),
        gen_params=gen_params,
        dis_params=dis_params,
        gen_opt=gen_tx.init(gen_params),
        dis_opt=dis_tx.init(dis_params),
        model_state=model_state,
        ema_params=ema,
    )
