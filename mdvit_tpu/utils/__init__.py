from mdvit_tpu.utils.pieces import DotDict, AvgMeter, flatten_dict, load_yaml

__all__ = ["DotDict", "AvgMeter", "flatten_dict", "load_yaml"]
