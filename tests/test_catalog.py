"""Bulk catalog inference + model-file sink (SURVEY.md §2.1 S7-S9)."""

import pytest

from pandera_forge_spark.codegen import validate_model_code
from pandera_forge_spark.sources.catalog import (
    infer_for_catalog,
    render_models_for_catalog,
    save_models_to_directory,
)


@pytest.fixture()
def catalog(spark):
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").createOrReplaceTempView(
        "region_v"
    )
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView(
        "nation_v"
    )
    yield
    spark.catalog.dropTempView("region_v")
    spark.catalog.dropTempView("nation_v")


def test_bulk_infer_render_save(spark, catalog, tmp_path):
    schemas, errors = infer_for_catalog(
        spark, sample_fraction=None, detect_patterns=False, table_filter="_v$"
    )
    assert errors == {}
    assert set(schemas) == {"region_v", "nation_v"}
    assert {c.name for c in schemas["region_v"].columns} == {
        "r_regionkey", "r_name",
    }

    models = render_models_for_catalog(schemas)
    for name, code in models.items():
        ok, err = validate_model_code(code, schemas[name].name)
        assert ok, (name, err)

    written = save_models_to_directory(models, str(tmp_path / "models"))
    names = {p.split("/")[-1] for p in written}
    assert names == {"region_v_model.py", "nation_v_model.py", "__init__.py"}
    init = (tmp_path / "models" / "__init__.py").read_text()
    assert "region_v_model" in init and "nation_v_model" in init
