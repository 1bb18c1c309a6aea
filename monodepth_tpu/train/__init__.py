"""Fine-tuning / domain adaptation: losses, train state, adapter, checkpoints."""

from monodepth_tpu.train.adapter import MarsDomainAdapter  # noqa: F401
from monodepth_tpu.train.losses import compute_losses  # noqa: F401
