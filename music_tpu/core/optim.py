"""Optimizer factories.

Parity surface: the reference's per-project ``get_optimizer`` helpers
(wavenet/train.py:28-42: sgd / rmsprop / adam; wavenet_autoencoder/train.py:26-34
adds lbfgs; leak_gan/train.py:60-90 wires per-module Adam + StepLR schedulers).
Built on optax so optimizer state is an ordinary pytree that shards and
checkpoints like everything else.
"""

from __future__ import annotations

from typing import Any, Mapping

import optax


class OptimizerError(ValueError):
    pass


def make_optimizer(
    name: str,
    learning_rate: float | optax.Schedule,
    *,
    momentum: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Build an optax optimizer by name.

    ``sgd`` / ``rmsprop`` / ``adam`` mirror wavenet/train.py:28-42; ``adamw``
    and ``lbfgs`` (wavenet_autoencoder/train.py:33-34) are also supported.
    ``grad_clip_norm`` covers the GANs' clip-by-norm (SeqGan_Pytorch/seqgan.py:35,
    leak_gan/train.py:133 use clip value 5).
    """
    name = name.lower()
    if name == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum or None)
    elif name == "rmsprop":
        tx = optax.rmsprop(learning_rate, momentum=momentum, eps=eps)
    elif name == "adam":
        tx = optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    elif name == "lbfgs":
        tx = optax.lbfgs(learning_rate)
    else:
        raise OptimizerError(f"unknown optimizer {name!r}")
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def step_lr(base_lr: float, step_size: int, gamma: float) -> optax.Schedule:
    """torch.optim.lr_scheduler.StepLR equivalent (leak_gan/train.py:78-90):
    lr = base_lr * gamma ** (epoch // step_size), expressed as an optax
    schedule over update steps."""

    def schedule(count):
        return base_lr * (gamma ** (count // step_size))

    return schedule


def from_config(cfg: Mapping[str, Any]) -> optax.GradientTransformation:
    """Build an optimizer from a reference-style train_params dict
    (keys: ``optimizer`` / ``optimizer_type``, ``learning_rate`` / ``lr``)."""
    name = cfg.get("optimizer", cfg.get("optimizer_type", "adam"))
    lr = cfg.get("learning_rate", cfg.get("lr", 1e-3))
    return make_optimizer(
        name,
        lr,
        momentum=cfg.get("momentum", 0.0),
        weight_decay=cfg.get("weight_decay", 0.0),
        grad_clip_norm=cfg.get("grad_clip_norm"),
    )
