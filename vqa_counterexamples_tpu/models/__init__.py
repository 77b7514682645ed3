from . import seq2vec, fusion, noatt, att, cx, factory
from .factory import factory_vqa, model_names
