from .recommender import Recommender, batch_to_device
from .baseretriever import BaseRetriever, TwoTowerNet

__all__ = ["Recommender", "BaseRetriever", "TwoTowerNet", "batch_to_device"]
