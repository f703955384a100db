"""Shared pytree-dataclass registration helper."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls):
    """Register a frozen dataclass whose fields are all pytree children."""
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
