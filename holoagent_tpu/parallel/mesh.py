"""Mesh construction from config."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    ``cfg.data == -1`` consumes all devices not claimed by the model axis.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model}")
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=cfg.axis_names)


def local_mesh(model: int = 1) -> Mesh:
    """Mesh over all local devices with the given model-axis width."""
    return make_mesh(MeshConfig(data=-1, model=model))
