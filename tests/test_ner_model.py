"""Perceptron NER model: determinism, span accuracy, call semantics, and the
distributed actor stage (rows-only query — these tests ARE its oracle)."""

import pandas as pd
import pytest

from rayextract.ner_model import (
    PerceptronNER,
    PerceptronNerTagger,
    heldout_corpus,
    span_f1,
    training_corpus,
)


@pytest.fixture(scope="module")
def model():
    return PerceptronNER()


def test_training_is_deterministic(model):
    # every worker trains its own copy; they must be bit-identical
    assert model.weight_digest() == PerceptronNER().weight_digest()


def test_training_set_f1(model):
    assert span_f1(model, training_corpus(300, seed=123)) >= 0.98


def test_heldout_f1_unseen_names(model):
    # names absent from the gazetteer AND the training vocab: measures what
    # the context features learned, not lexical memory
    assert span_f1(model, heldout_corpus()) >= 0.95


def test_first_span_call_semantics(model):
    assert (
        model.get_person_name("PATIENT NAME ZORA KRAVITZ DOB 01/02/1990")
        == "ZORA KRAVITZ"
    )
    assert (
        model.get_organization_name(
            "INVOICE 123456 FROM NIMBUS FREIGHT LLC TOTAL $12.50"
        )
        == "NIMBUS FREIGHT LLC"
    )
    # hard negative: keyword/amount/code lines carry no entities
    assert model.get_person_name("TOTAL AMOUNT DUE 450.25 REFERENCE AB12X") is None
    assert model.get_person_name("") is None


def test_actor_stage_matches_local(model, ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "patient name zora kravitz dob 01/02/1990",
                "invoice 7 from nimbus freight llc total $1.00",
                "total amount due 450.25",
            ],
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(
            PerceptronNerTagger,
            batch_format="pandas",
            concurrency=(1, 2),
            num_cpus=1,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    up = df["text"].str.upper()
    assert list(out["person"]) == [model.get_person_name(t) for t in up]
    assert list(out["org"]) == [model.get_organization_name(t) for t in up]
