"""Model lifecycle protocol + adapter.

The reference couples model, losses and metrics in an ``nn.Module``
lifecycle (lib/models/model_abc.py:5-49: training_step /
validation_step / testing_step / on_*_finished / compute_loss). In a
functional JAX design those concerns live in pure functions
(models/losses.py) and harness objects (training/trainer.py,
training/evaluator.py). :class:`LifecycleAdapter` reconstitutes the
familiar surface for users migrating from the reference: the same
method names, driving the SPMD trainer/evaluator underneath.
"""

from __future__ import annotations

from typing import Any, Dict, Protocol


class ModelABC(Protocol):
    """The reference lifecycle contract (for structural typing)."""

    def training_step(self, batch, step_idx, **kwargs): ...

    def validation_step(self, batch, step_idx, **kwargs): ...

    def testing_step(self, batch, step_idx, **kwargs): ...

    def on_train_finished(self, recorder, epoch_idx, **kwargs): ...

    def on_val_finished(self, recorder, epoch_idx, **kwargs): ...


class LifecycleAdapter:
    """Reference-style lifecycle over (model, aux, trainer, evaluator)."""

    def __init__(self, model, aux: Dict[str, Any], trainer, evaluator):
        self.model = model
        self.aux = aux
        self.trainer = trainer
        self.evaluator = evaluator
        self.state = None

    # -- reference surface --------------------------------------------------
    def setup(self, summary_writer=None, **kwargs):
        self.summary = summary_writer

    def init(self, sample_batch):
        self.state = self.trainer.init_state(sample_batch)
        return self.state

    def training_step(self, batch, step_idx: int, **kwargs):
        assert self.state is not None, "call init() first"
        self.state, metrics = self.trainer.step(self.state, batch)
        if self.summary is not None and hasattr(self.summary, "add_scalar"):
            for k, v in metrics.items():
                try:
                    self.summary.add_scalar(k, float(v), step_idx)
                except Exception:
                    pass
        return metrics

    def validation_step(self, batch, step_idx: int, **kwargs):
        return self.testing_step(batch, step_idx, **kwargs)

    def testing_step(self, batch, step_idx: int, callback=None, **kwargs):
        params = self.state.params if self.state is not None else kwargs["params"]
        return self.evaluator.run(params, [batch], callback=callback)

    def on_train_finished(self, recorder, epoch_idx: int, **kwargs):
        recorder.record_checkpoint(self.state, epoch_idx)

    def on_val_finished(self, recorder, epoch_idx: int, **kwargs):
        results = {}
        for m in (self.evaluator.MPJPE, self.evaluator.MPVPE, self.evaluator.PA):
            results.update(m.get_measures())
        recorder.record_metric([f"{k}: {v:.6f}" for k, v in results.items()], epoch_idx)
        self.evaluator.reset()
        return results
