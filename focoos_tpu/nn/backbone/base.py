"""Backbone protocol (reference: focoos/nn/backbone/base.py:16-36).

Backbones are flax modules mapping an NHWC image batch to a dict of feature
maps ``{"res2": [B,H/4,W/4,C2], ..., "res5": [B,H/32,W/32,C5]}``, plus a
static ``output_shape()`` descriptor used by heads at construction time.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields
from typing import Any, Dict, Optional

from flax import linen as nn


@dataclass
class ShapeSpec:
    channels: int
    stride: int
    height: Optional[int] = None
    width: Optional[int] = None


@dataclass
class BackboneConfig:
    model_type: str = "base"
    use_pretrained: bool = True
    backbone_url: Optional[str] = None

    def to_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    @classmethod
    def from_dict(cls, d: dict) -> "BackboneConfig":
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class BaseBackbone(nn.Module):
    """All backbones subclass this and define ``config`` plus ``__call__``."""

    config: Any

    def output_shape(self) -> Dict[str, ShapeSpec]:
        raise NotImplementedError

    @property
    def size_divisibility(self) -> int:
        return 0

    @property
    def padding_constraints(self) -> Dict[str, int]:
        return {}
