"""Process-0-gated logging with optional wandb.

Mirrors the reference ``Logger`` (``/root/reference/logger.py:5-29``) — same
``print`` / ``wandbLog`` API, gated on process index — but authenticates via
``wandb.login(key=...)`` instead of the reference's ``os.system("wandb login
<key>")`` shell-out (documented defect §7 in SURVEY.md), degrades gracefully
when wandb is not installed, and also mirrors everything to a local JSONL
metrics file so runs are inspectable without any external service.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class Logger:
    def __init__(self, process_index: int, sys_config=None, metrics_path: Optional[str] = None):
        self.process_index = process_index
        self.wandb_disabled = bool(getattr(sys_config, "wandb_disabled", True))
        self._wandb = None
        self._metrics_file = None

        if process_index == 0 and metrics_path:
            os.makedirs(os.path.dirname(metrics_path) or ".", exist_ok=True)
            self._metrics_file = open(metrics_path, "a")

        if process_index == 0 and sys_config is not None and not self.wandb_disabled:
            try:
                import wandb

                if getattr(sys_config, "wandb_key", ""):
                    wandb.login(key=sys_config.wandb_key)
                wandb.init(
                    project=sys_config.wandb_project,
                    entity=sys_config.wandb_entity or None,
                    name=sys_config.wandb_name,
                    notes=sys_config.wandb_notes,
                )
                self._wandb = wandb
            except Exception as e:  # wandb absent or offline: never fatal
                self.print(f"[logger] wandb disabled ({type(e).__name__}: {e})")

    def wandbLog(self, contents: dict, step: Optional[int] = None):
        if self.process_index != 0:
            return
        if self._metrics_file is not None:
            rec = {"t": time.time(), **{k: _tofloat(v) for k, v in contents.items()}}
            if step is not None:
                rec["step"] = step
            self._metrics_file.write(json.dumps(rec) + "\n")
            self._metrics_file.flush()
        if self._wandb is not None:
            self._wandb.log(contents, step=step)

    # alias with a non-wandb name; both kept for API familiarity
    log = wandbLog

    def print(self, *args):
        if self.process_index != 0:
            return
        print(*args, flush=True)

    def close(self):
        if self._metrics_file is not None:
            self._metrics_file.close()
            self._metrics_file = None


def _tofloat(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
