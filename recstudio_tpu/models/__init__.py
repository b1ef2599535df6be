from . import basemodel, init, loss_func, module, scorer

__all__ = ["basemodel", "init", "loss_func", "module", "scorer"]
