from .frame_fit import FitParams, FitResult, OneFrameFit, anatomical_loss
