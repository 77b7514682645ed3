from . import seq2vec, fusion, noatt, att, convnets, cx, factory
from .factory import factory_cx, factory_vqa, cx_model_names, model_names
