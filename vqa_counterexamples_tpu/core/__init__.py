from . import config, meters, experiment, checkpoint, rng
