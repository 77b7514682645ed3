from . import fusion, scorer, rnn, topk, metrics
