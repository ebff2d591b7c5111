from .regularization import L2Norm
