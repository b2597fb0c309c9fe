from metaviterbinet_tpu.train.losses import make_loss_fn, select_batch  # noqa: F401
from metaviterbinet_tpu.train.optim import make_optimizer  # noqa: F401
