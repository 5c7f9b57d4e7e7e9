"""TensorBoard summary writer, process-0 gated.

Equivalent of the reference ``DDPSummaryWriter``
(lib/utils/summary_writer.py): scalars/images logged only on the master
process. Backed by torch.utils.tensorboard (the only TB backend baked
into this image); falls back to a no-op if unavailable.
"""

from __future__ import annotations


from .logger import master_only


class SummaryWriter:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter as _TB

            import jax

            if jax.process_index() == 0:
                self._writer = _TB(log_dir=log_dir)
        except Exception:
            self._writer = None

    @master_only
    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    @master_only
    def add_image(self, tag: str, img, step: int, dataformats: str = "HWC") -> None:
        if self._writer is not None:
            self._writer.add_image(tag, img, step, dataformats=dataformats)

    @master_only
    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    @master_only
    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
