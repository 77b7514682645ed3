from . import cx_engine, vqa_engine, contrastive_engine
