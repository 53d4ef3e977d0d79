"""Caption quality metrics: corpus BLEU, ROUGE, BERTScore.

Rebuild of the reference metrics layer (reference: src/utils/metrics.py).
BLEU and ROUGE use the same libraries as the reference (sacrebleu, rouge) —
these run on host CPU and are not a compute path. BERTScore differs: the
reference wraps the ``bert_score`` package (reference:
src/deps/ext/bert_score/__init__.py); that package is not available here,
so ``bert_score`` computes the same greedy-cosine-matching F1 directly on
top of a HuggingFace encoder when one is available locally, and raises a
clear error otherwise.

All three take ``(dataset, predictions)`` where dataset samples carry their
annotations at ``annotation_index`` (default 4, the
AnnotatedTopImagesDataset layout).
"""
import warnings
from typing import Any, Mapping, Optional, Sequence

from neuron_descriptions_tpu.utils.typing import StrSequence

__all__ = ["bleu", "rouge", "bert_score"]


def _references(dataset: Any, count: int,
                annotation_index: int) -> Sequence[Sequence[str]]:
    references = []
    for index in range(count):
        annotations = dataset[index][annotation_index]
        if isinstance(annotations, str):
            annotations = [annotations]
        references.append([anno.lower().strip(". ") for anno in annotations])
    return references


def bleu(dataset: Any,
         predictions: StrSequence,
         annotation_index: int = 4) -> Any:
    """Corpus BLEU of predictions against dataset annotations
    (reference: metrics.py:16-46)."""
    import sacrebleu
    predictions = [pred.lower().strip(". ") for pred in predictions]
    references = _references(dataset, len(predictions), annotation_index)
    # sacrebleu wants reference lists transposed: one stream per annotator.
    width = max(len(refs) for refs in references)
    streams = [[refs[i] if i < len(refs) else None for refs in references]
               for i in range(width)]
    return sacrebleu.corpus_bleu(predictions, streams)


def rouge(dataset: Any,
          predictions: StrSequence,
          annotation_index: int = 4) -> Mapping[str, Mapping[str, float]]:
    """Average ROUGE-1/2/l scores (reference: metrics.py:49-91)."""
    import rouge as rouge_lib
    hypotheses, references = [], []
    for index, prediction in enumerate(predictions):
        prediction = prediction.lower().strip(". ")
        annotations = dataset[index][annotation_index]
        if isinstance(annotations, str):
            annotations = [annotations]
        for annotation in annotations:
            annotation = annotation.lower().strip(". ")
            if not annotation:
                continue
            hypotheses.append(prediction)
            references.append(annotation)
    scorer = rouge_lib.Rouge()
    return scorer.get_scores(hypotheses, references, avg=True,
                             ignore_empty=True)


def bert_score(dataset: Any,
               predictions: StrSequence,
               annotation_index: int = 4,
               batch_size: int = 16,
               model_name: str = "roberta-large",
               idf: bool = True,
               device: Optional[Any] = None,
               bert_scorer: Optional[Any] = None) -> Mapping[str, float]:
    """Average BERTScore precision/recall/F1 (reference: metrics.py:94-150).

    Computes greedy cosine matching over contextual token embeddings with
    optional idf weighting (Zhang et al., 2020). Requires the transformers
    model to be available locally (offline environments must pre-download).
    Baseline rescaling (a lookup table shipped with the bert_score package)
    is not applied; scores are raw cosine F1s.
    """
    del device, bert_scorer  # torch-ecosystem options; unused here
    import collections
    import math

    import numpy as np

    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name)
    except Exception as error:
        raise RuntimeError(
            f"bert_score requires a local copy of {model_name}; "
            f"pre-download it or pass model_name=") from error
    model.eval()

    predictions = [pred.lower().strip(". ") for pred in predictions]
    references = _references(dataset, len(predictions), annotation_index)

    # idf over the reference corpus (reference: metrics.py:142-145).
    flat_refs = [ref for refs in references for ref in refs]
    idf_weights: Mapping[int, float] = {}
    if idf:
        doc_freq: collections.Counter = collections.Counter()
        for ref in flat_refs:
            doc_freq.update(set(tokenizer(ref)["input_ids"]))
        n_docs = max(len(flat_refs), 1)
        idf_weights = {
            tok: math.log((n_docs + 1) / (freq + 1))
            for tok, freq in doc_freq.items()
        }

    def embed(texts: Sequence[str]):
        embeddings, weights = [], []
        for start in range(0, len(texts), batch_size):
            chunk = list(texts[start:start + batch_size])
            encoded = tokenizer(chunk, return_tensors="pt", padding=True,
                                truncation=True)
            with torch.no_grad():
                hidden = model(**encoded).last_hidden_state
            hidden = torch.nn.functional.normalize(hidden, dim=-1)
            for row in range(len(chunk)):
                live = encoded["attention_mask"][row].bool()
                ids = encoded["input_ids"][row][live].tolist()
                embeddings.append(hidden[row][live].numpy())
                if idf:
                    weights.append(np.asarray(
                        [idf_weights.get(tok, 0.0) for tok in ids]))
                else:
                    weights.append(np.ones(len(ids)))
        return embeddings, weights

    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", message=r".*Overwriting.*")
        pred_emb, pred_w = embed(predictions)
        ref_emb, ref_w = embed(flat_refs)

    # Greedy matching: each pred token to its best ref token and vice versa.
    ps, rs, fs = [], [], []
    cursor = 0
    for index, refs in enumerate(references):
        best_f, best_p, best_r = -1.0, 0.0, 0.0
        for _ in refs:
            sim = pred_emb[index] @ ref_emb[cursor].T
            pw, rw = pred_w[index], ref_w[cursor]
            precision = float((sim.max(axis=1) * pw).sum() /
                              max(pw.sum(), 1e-8))
            recall = float((sim.max(axis=0) * rw).sum() /
                           max(rw.sum(), 1e-8))
            f1 = (2 * precision * recall / (precision + recall)
                  if precision + recall > 0 else 0.0)
            if f1 > best_f:
                best_f, best_p, best_r = f1, precision, recall
            cursor += 1
        ps.append(best_p)
        rs.append(best_r)
        fs.append(best_f)

    return {"p": float(np.mean(ps)), "r": float(np.mean(rs)),
            "f": float(np.mean(fs))}
