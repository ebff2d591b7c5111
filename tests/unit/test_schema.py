import os
import json

import numpy as np
import pytest

from models_tpu.schema import (
    ColumnSchema,
    Domain,
    Schema,
    Tags,
    create_categorical_column,
    create_continuous_column,
    infer_embedding_dim,
)


def make_schema():
    return Schema(
        [
            create_categorical_column("user_id", 100, tags=(Tags.USER, Tags.USER_ID)),
            create_categorical_column("item_id", 1000, tags=(Tags.ITEM, Tags.ITEM_ID)),
            create_categorical_column(
                "genres", 20, tags=Tags.ITEM, is_list=True, max_seq_length=4
            ),
            create_continuous_column("age", tags=Tags.USER),
            ColumnSchema("click", tags=(Tags.BINARY_CLASSIFICATION, Tags.TARGET), dtype="int32"),
        ]
    )


def test_select_by_tag():
    s = make_schema()
    assert s.select_by_tag(Tags.USER).column_names == ["user_id", "age"]
    assert s.select_by_tag(Tags.ITEM_ID).column_names == ["item_id"]
    assert s.categorical.column_names == ["user_id", "item_id", "genres"]
    assert s.continuous.column_names == ["age"]
    assert s.targets.column_names == ["click"]
    assert s.excluding_by_tag(Tags.TARGET).column_names == [
        "user_id", "item_id", "genres", "age",
    ]


def test_id_columns_and_cardinality():
    s = make_schema()
    assert s.item_id_column.name == "item_id"
    assert s.user_id_column.name == "user_id"
    assert s["item_id"].cardinality == 1001
    assert s.cardinalities()["user_id"] == 101


def test_json_roundtrip():
    s = make_schema()
    s2 = Schema.from_json(s.to_json())
    assert s2.column_names == s.column_names
    for c1, c2 in zip(s, s2):
        assert set(c1.tags) == set(c2.tags)
        assert c1.is_list == c2.is_list
        assert c1.cardinality == c2.cardinality
    assert s2["genres"].max_seq_length == 4


def test_reads_reference_style_json():
    # TF-metadata layout as produced by NVTabular (SURVEY.md §2.8)
    ref = {
        "feature": [
            {
                "name": "movieId",
                "type": "INT",
                "intDomain": {"name": "movieId", "min": "1", "max": "1680", "isCategorical": True},
                "annotation": {
                    "tag": ["item", "categorical", "item_id"],
                    "extraMetadata": [{"is_list": False, "is_ragged": False, "dtype_item_size": 32.0}],
                },
            }
        ]
    }
    s = Schema.from_dict(ref)
    col = s["movieId"]
    assert col.has_tag(Tags.ITEM_ID)
    assert col.cardinality == 1681
    assert col.dtype == "int32"


def test_infer_embedding_dim():
    c = create_categorical_column("x", 10000)
    d = infer_embedding_dim(c)
    assert d % 8 == 0
    assert 8 <= d <= 64


def test_tag_modifiers():
    c = create_continuous_column("x")
    c2 = c.with_tags(Tags.TARGET)
    assert c2.is_target and not c.is_target
    assert not c2.without_tags(Tags.TARGET).is_target


def test_schema_add_and_domain_sharing():
    a = Schema([create_categorical_column("q_item", 50, domain_name="item")])
    b = Schema([create_categorical_column("c_item", 50, domain_name="item")])
    merged = a + b
    assert merged["q_item"].domain_name == merged["c_item"].domain_name == "item"


def test_pbtxt_roundtrip_parse():
    pbtxt = '''
feature {
  name: "user_id"
  type: INT
  int_domain {
    name: "user_id"
    max: 1000
    is_categorical: true
  }
  annotation {
    tag: "user_id"
    tag: "categorical"
  }
}
feature {
  name: "genres"
  type: INT
  value_count {
    min: 1
    max: 6
  }
  int_domain {
    name: "genres"
    max: 20
    is_categorical: true
  }
  annotation {
    tag: "categorical"
    tag: "item"
  }
}
feature {
  name: "price"
  type: FLOAT
  annotation {
    tag: "continuous"
  }
}
'''
    s = Schema.from_pbtxt(pbtxt)
    assert s.column_names == ["user_id", "genres", "price"]
    assert s["user_id"].cardinality == 1001
    assert s["user_id"].has_tag(Tags.USER_ID)
    assert s["genres"].is_list and s["genres"].max_seq_length == 6
    assert s["price"].is_continuous


REFERENCE_DATASETS = "/root/reference/merlin/datasets"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATASETS), reason="reference absent")
def test_loads_every_reference_schema_sidecar():
    """Interop sweep: every schema.json / schema.pbtxt the reference ships for
    its fixture datasets parses into a non-empty Schema with usable dtypes
    (the NVTabular sidecar contract end to end)."""
    import glob as _glob

    json_files = _glob.glob(os.path.join(REFERENCE_DATASETS, "**", "schema.json"), recursive=True)
    pbtxt_files = _glob.glob(os.path.join(REFERENCE_DATASETS, "**", "schema.pbtxt"), recursive=True)
    assert len(json_files) >= 5 and len(pbtxt_files) >= 5
    parsed = 0
    for f in json_files:
        s = Schema.load(f)
        assert len(s) > 0, f
        for col in s:
            assert col.dtype, (f, col.name)
        parsed += 1
    for f in pbtxt_files:
        s = Schema.load_pbtxt(f)
        assert len(s) > 0, f
        parsed += 1
    assert parsed == len(json_files) + len(pbtxt_files)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATASETS), reason="reference absent")
def test_reference_aliccp_schema_semantics():
    """Spot-check the Ali-CCP raw pbtxt: item/user ids carry the right tags and
    int domains (what model constructors key off)."""
    s = Schema.load_pbtxt(os.path.join(REFERENCE_DATASETS, "ecommerce/aliccp/raw/schema.pbtxt"))
    item = s.select_by_tag(Tags.ITEM_ID)
    user = s.select_by_tag(Tags.USER_ID)
    assert len(item) == 1 and len(user) == 1
    assert item.first.cardinality and item.first.cardinality > 1000
