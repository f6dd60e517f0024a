"""Scene graph: background + instances + lights + TLAS, with animation.

Mirrors the reference Scene (/root/reference/sources/scene.cpp:17-59):
emissive instances are collected into a light list at construction; the
background is solid or a vertical gradient; ``update(dt)`` rotates instance 3
about WORLD_UP and refits the TLAS (scene.cpp:53-59).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..accel import build_tlas, refit
from ..core import transform as tf
from .instance import Instance

BG_SOLID = 0
BG_GRADIENT = 1


@dataclass
class SceneBackground:
    type: int = BG_SOLID
    color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    gradient_a: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    gradient_b: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))

    def __post_init__(self):
        self.color = np.asarray(self.color, np.float32).reshape(3)
        self.gradient_a = np.asarray(self.gradient_a, np.float32).reshape(3)
        self.gradient_b = np.asarray(self.gradient_b, np.float32).reshape(3)


class Scene:
    def __init__(self, background: SceneBackground, instances: list[Instance]):
        self.background = background
        self.instances = list(instances)
        # Light collection at build (scene.cpp:23-33).
        self.light_indices = [
            i for i, inst in enumerate(self.instances) if inst.material.is_light()
        ]
        self.tlas = self._build_tlas()
        self.version = 0  # bumped on update so compiled scenes know to refresh

    def _instance_bounds(self):
        lo = np.stack([inst.bounds_min for inst in self.instances])
        hi = np.stack([inst.bounds_max for inst in self.instances])
        return lo, hi

    def _build_tlas(self):
        lo, hi = self._instance_bounds()
        return build_tlas(lo, hi)

    @property
    def light_count(self) -> int:
        return len(self.light_indices)

    def update(self, delta_time: float) -> None:
        """Animate instance 3 (rotation about WORLD_UP, scene.cpp:53-59) and
        refit the TLAS over the refreshed instance bounds.  Scenes with
        fewer instances animate their last instance instead."""
        inst = self.instances[min(3, len(self.instances) - 1)]
        inst.set_transform(
            tf.rotate(inst.transform, 1.0 * float(delta_time), [0.0, 1.0, 0.0])
        )
        lo, hi = self._instance_bounds()
        self.tlas = refit(self.tlas, lo, hi)
        self.version += 1
