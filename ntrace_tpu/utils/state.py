"""App-state save/load (~ framework/io/StateDump.{cpp,hpp}).

The reference checkpoints interactive state (camera pose, control-panel
toggles) to a binary StateDump so sessions resume where they left off.
The rebuild's equivalent is a JSON document holding the camera signature
plus the render/build configs -- everything needed to reproduce a frame
or benchmark run exactly (SURVEY.md SS6.4).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

from ntrace_tpu.core import BuildConfig, Camera, RenderConfig

STATE_VERSION = 1


def save_state(path, camera: Camera, render_cfg: RenderConfig | None = None,
               build_cfg: BuildConfig | None = None, extra: dict | None = None):
    doc = {
        "version": STATE_VERSION,
        "camera": camera.encode_signature(),
        "render": dataclasses.asdict(render_cfg) if render_cfg else None,
        "build": dataclasses.asdict(build_cfg) if build_cfg else None,
        "extra": extra or {},
    }
    Path(path).write_text(json.dumps(doc, indent=2))


def load_state(path):
    doc = json.loads(Path(path).read_text())
    if doc.get("version") != STATE_VERSION:
        raise ValueError(f"unsupported state version {doc.get('version')}")
    camera = Camera.decode_signature(doc["camera"])
    render_cfg = RenderConfig(**_delistify(doc["render"])) if doc.get("render") else None
    build_cfg = BuildConfig(**doc["build"]) if doc.get("build") else None
    return camera, render_cfg, build_cfg, doc.get("extra", {})


def _delistify(d: dict) -> dict:
    # JSON turns tuples into lists; RenderConfig.light expects a tuple.
    return {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
