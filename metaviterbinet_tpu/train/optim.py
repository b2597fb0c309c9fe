"""Optimizer factory (reference trainer.py:163-177 Adam/RMSprop/SGD)."""
import optax


def make_optimizer(optimizer_type: str, lr: float,
                   clip_grad_norm: float = 0.0) -> optax.GradientTransformation:
    """clip_grad_norm > 0 prepends global-norm gradient clipping — an opt-in
    robustness knob for the online meta loops (the reference has no clipping;
    default 0 keeps parity)."""
    if optimizer_type == "Adam":
        opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif optimizer_type == "RMSprop":
        opt = optax.rmsprop(lr, decay=0.99, eps=1e-8)
    elif optimizer_type == "SGD":
        opt = optax.sgd(lr)
    else:
        raise NotImplementedError(f"No such optimizer: {optimizer_type}")
    if clip_grad_norm and clip_grad_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_grad_norm), opt)
    return opt
