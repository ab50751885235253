from tpulmi.models.mlp import MLP, MODEL_HIDDEN_DIMS, make_model
from tpulmi.models.train import BucketClassifier, TrainState, train_lr_sweep

__all__ = ["MLP", "MODEL_HIDDEN_DIMS", "make_model", "BucketClassifier",
           "TrainState", "train_lr_sweep"]
