from . import tokenizers, vqacx, features, synthetic
