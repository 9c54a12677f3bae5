"""L4 data layer: dataset loaders and registry.

Registry mirrors reference ``src/data_loader/__init__.py`` (name-keyed
``collections``); adds a self-contained synthetic loader for dataset-free
runs and tests.
"""

import os

DATASET_ROOT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "datasets"
)

from .base import DataLoaderBase
from .dsec import DsecDataLoader
from .ecd import EcdDataLoader
from .evt2 import Evt2DataLoader
from .evt3 import Evt3DataLoader
from .mvsec import MvsecDataLoader
from .synthetic import SyntheticDataLoader

collections = {
    MvsecDataLoader.NAME: MvsecDataLoader,
    SyntheticDataLoader.NAME: SyntheticDataLoader,
    DsecDataLoader.NAME: DsecDataLoader,
    EcdDataLoader.NAME: EcdDataLoader,
    Evt2DataLoader.NAME: Evt2DataLoader,
    Evt3DataLoader.NAME: Evt3DataLoader,
}

__all__ = ["DataLoaderBase", "MvsecDataLoader", "SyntheticDataLoader", "DsecDataLoader", "EcdDataLoader", "Evt2DataLoader", "Evt3DataLoader", "collections", "DATASET_ROOT_DIR"]
