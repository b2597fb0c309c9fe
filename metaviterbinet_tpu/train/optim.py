"""Optimizer factory (reference trainer.py:163-177 Adam/RMSprop/SGD)."""
import optax


def make_optimizer(optimizer_type: str, lr: float) -> optax.GradientTransformation:
    if optimizer_type == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if optimizer_type == "RMSprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    if optimizer_type == "SGD":
        return optax.sgd(lr)
    raise NotImplementedError(f"No such optimizer: {optimizer_type}")
