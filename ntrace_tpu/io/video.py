"""Frame-sequence capture (~ framework/io/AviExporter.{cpp,hpp}).

The reference records interactive sessions to AVI. Headless equivalent:
render frames along a camera path and write an mp4/gif via imageio (both
formats by extension; gif needs no codecs). Camera paths are simple
orbits/lerps -- enough to produce turntable captures of any scene.
"""

from __future__ import annotations

import numpy as np

from ntrace_tpu.core import Camera
from ntrace_tpu.io.image import tonemap


def orbit_path(center, radius: float, height: float, n_frames: int,
               fov_deg: float = 60.0):
    """Cameras orbiting `center` at `radius`, looking inward."""
    center = np.asarray(center, np.float32)
    cams = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        pos = center + np.array(
            [radius * np.cos(ang), height, radius * np.sin(ang)], np.float32
        )
        cams.append(Camera(position=pos, forward=center - pos, fov_deg=fov_deg))
    return cams


def lerp_path(cam_a: Camera, cam_b: Camera, n_frames: int):
    """Linear camera interpolation between two poses."""
    cams = []
    for i in range(n_frames):
        t = i / max(n_frames - 1, 1)
        cams.append(Camera(
            position=(1 - t) * cam_a.position + t * cam_b.position,
            forward=(1 - t) * cam_a.forward + t * cam_b.forward,
            fov_deg=(1 - t) * cam_a.fov_deg + t * cam_b.fov_deg,
        ))
    return cams


def export_video(renderer, cameras, path: str, fps: int = 24,
                 mode: str | None = None) -> list:
    """Render one frame per camera and write a video file.

    renderer: a render.Renderer; cameras: list[Camera]; path: .mp4 or .gif.
    Returns the per-frame stats list.
    """
    import imageio

    frames = []
    stats = []
    for cam in cameras:
        res = renderer.render(cam, mode=mode)
        frames.append(tonemap(res.image))
        stats.append(res.stats)
    if str(path).endswith(".gif"):
        imageio.mimsave(path, frames, duration=1000.0 / fps)
    else:
        imageio.mimsave(path, frames, fps=fps)
    return stats
