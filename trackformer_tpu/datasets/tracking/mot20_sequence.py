"""MOT20 sequence: same layout as MOT17 in a different folder
(reference mot20_sequence.py:9-15)."""
from .mot17_sequence import MOTSequenceBase


class MOT20Sequence(MOTSequenceBase):
    data_folder = "MOT20"
