"""Experiment recorder: directories, config dump, checkpoints, metrics.

Parity with the reference ``Recorder`` (lib/utils/recorder.py:26-182)
+ checkpoint I/O (lib/utils/io_utils.py:22-150), rebuilt on orbax:
each checkpoint stores params / opt-state / step / PRNG key — the JAX
equivalent of the reference's model + train_param + random_state
triple — and resume restores all of them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax

from .logger import get_logger, master_only


class Recorder:
    def __init__(
        self,
        exp_id: str,
        cfg=None,
        root: str = "exp",
        eval_only: bool = False,
        timestamp: Optional[str] = None,
    ):
        self.exp_id = exp_id
        skip_git = os.environ.get("POEM_SKIP_GIT_CHECK") == "1"
        if exp_id not in ("default", "tmp") and not eval_only and not skip_git:
            self._assert_clean_git()
        ts = timestamp or time.strftime("%Y_%m%d_%H%M_%S")
        self.dump_path = os.path.join(root, f"{exp_id}_{ts}")
        self.eval_only = eval_only
        if jax.process_index() == 0:
            os.makedirs(os.path.join(self.dump_path, "checkpoints"), exist_ok=True)
            os.makedirs(os.path.join(self.dump_path, "evaluations"), exist_ok=True)
            os.makedirs(os.path.join(self.dump_path, "runs"), exist_ok=True)
        self.logger = get_logger(
            "poem_tpu", log_file=os.path.join(self.dump_path, "log.txt")
        ) if jax.process_index() == 0 else get_logger()
        if cfg is not None:
            self.dump_cfg(cfg)

    @staticmethod
    def _assert_clean_git() -> None:
        """Named experiments require a clean tree (reference recorder.py:38)."""
        import subprocess

        try:
            out = subprocess.run(
                ["git", "status", "--porcelain"], capture_output=True, text=True, timeout=10
            )
        except Exception:
            return
        if out.returncode == 0 and out.stdout.strip():
            raise RuntimeError(
                "git tree is dirty; commit your changes or use --exp_id default"
            )

    @master_only
    def dump_cfg(self, cfg) -> None:
        with open(os.path.join(self.dump_path, "dump_cfg.yaml"), "w") as f:
            cfg.dump(f)

    # -- checkpointing ------------------------------------------------------
    def _ckpt_dir(self, tag: str) -> str:
        return os.path.abspath(os.path.join(self.dump_path, "checkpoints", tag))

    def record_checkpoint(self, state, epoch: int, snapshot_every: int = 0) -> None:
        """Save params/opt-state/step/rng via orbax (reference io_utils.py:22-53)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        path = self._ckpt_dir("checkpoint")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, payload)
        ckptr.wait_until_finished()
        if snapshot_every and (epoch + 1) % snapshot_every == 0:
            import shutil

            shutil.copytree(path, self._ckpt_dir(f"checkpoint_{epoch + 1}"))
        with open(os.path.join(self.dump_path, "checkpoints", "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "step": int(state.step)}, f)

    def resume(self, state, path: Optional[str] = None):
        """Restore a TrainState saved by :meth:`record_checkpoint`."""
        import orbax.checkpoint as ocp

        path = path or self._ckpt_dir("checkpoint")
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "rng": state.rng,
        }
        restored = ckptr.restore(os.path.abspath(path), template)
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            rng=restored["rng"],
        )

    @staticmethod
    def load_params(path: str, params_template):
        """Weights-only reload (the reference's --reload / MODEL.PRETRAINED)."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": params_template,
            "opt_state": None,
            "step": None,
            "rng": None,
        }
        try:
            restored = ckptr.restore(os.path.abspath(path), template)
            return restored["params"]
        except Exception:
            restored = ckptr.restore(os.path.abspath(path))
            return restored["params"] if "params" in restored else restored

    # -- metric text dumps (reference recorder.py:140-159) ------------------
    @master_only
    def record_metric(self, metrics, epoch_idx: int, comment: str = "") -> None:
        path = os.path.join(self.dump_path, "evaluations", f"metric_{comment}.txt")
        with open(path, "a") as f:
            parts = []
            for m in metrics:
                parts.append(str(m))
            f.write(f"epoch {epoch_idx}: " + " | ".join(parts) + "\n")

    @master_only
    def record_loss(self, loss_metric, epoch_idx: int, comment: str = "") -> None:
        path = os.path.join(self.dump_path, "evaluations", f"loss_{comment}.txt")
        with open(path, "a") as f:
            f.write(f"epoch {epoch_idx}: {loss_metric}\n")
