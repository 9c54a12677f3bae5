"""Model zoo (LX layer): EV-FlowNet and building blocks, in flax.linen.

The reference ships an unused torch EV-FlowNet (its DNN entry raises
NotImplementedError, reference main.py:151-168); here the model is a
first-class citizen: flax module, jit/pjit-able training step, event
voxel-grid featurizer.
"""

from .basic_layers import ConvBlock, ResidualBlock, UpsampleConvAndPredict
from .ev_flownet import EVFlowNet, events_to_voxel_grid
from .train import dnn_train_step, make_dnn_train_state, run_dnn_flow, unsupervised_cmax_loss

__all__ = [
    "EVFlowNet",
    "events_to_voxel_grid",
    "ConvBlock",
    "ResidualBlock",
    "UpsampleConvAndPredict",
    "dnn_train_step",
    "make_dnn_train_state",
    "unsupervised_cmax_loss",
    "run_dnn_flow",
]
