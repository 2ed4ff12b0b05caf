"""bisenetformer criterion — identical to fai_mf's (the reference ships a
byte-identical SetCriterion copy, focoos/models/bisenetformer/loss.py)."""

from focoos_tpu.models.fai_mf.loss import maskformer_criterion, make_loss_fn  # noqa: F401
