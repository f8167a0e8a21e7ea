"""Scene: cameras + keyframes + scene-extent estimation.

Host-side analog of the reference's GaussianScene
(reference: include/gaussian_scene.h:36-79, src/gaussian_scene.cpp). The
reference guards its keyframe map with a mutex yet leaks references
(gaussian_scene.cpp:62-66, a latent race SURVEY.md flags); here the mapper
thread owns the scene exclusively and the render service works on immutable
snapshots of the params pytree, so no locking is needed.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from photo_slam_tpu.models.camera import Camera
from photo_slam_tpu.models.keyframe import Keyframe


@dataclass
class Scene:
    cameras: dict[int, Camera] = field(default_factory=dict)
    keyframes: dict[int, Keyframe] = field(default_factory=dict)
    cameras_extent: float = 1.0

    def add_camera(self, cam: Camera) -> None:
        self.cameras[cam.camera_id] = cam

    def add_keyframe(self, kf: Keyframe) -> None:
        self.keyframes[kf.fid] = kf

    def compute_nerfpp_norm(self) -> float:
        """cameras_extent = 1.1 * max distance of any camera center from the
        mean center (reference: src/gaussian_scene.cpp:120-151 getNerfppNorm).
        """
        centers = []
        for kf in self.keyframes.values():
            if kf.matrices is not None:
                centers.append(np.asarray(kf.matrices.cam_center))
        if not centers:
            self.cameras_extent = 1.0
            return self.cameras_extent
        c = np.stack(centers)
        mean = c.mean(axis=0)
        diag = np.linalg.norm(c - mean, axis=1).max()
        self.cameras_extent = float(diag * 1.1)
        if self.cameras_extent <= 0:
            self.cameras_extent = 1.0
        return self.cameras_extent
