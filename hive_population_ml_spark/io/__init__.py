from .adapters import csv_scan, excel_scan, lookup_map_df, records_to_df
from .annotations import (
    hive_id_mapping,
    phenotypic_measurements,
    population_annotations,
    winter_mortality,
)
from .sinks import (
    load_model,
    read_metrics_json,
    read_predictions,
    save_model,
    write_metrics_json,
    write_predictions,
)
from .sources import TABLE_NAMES, Tables, load_table, register_views

__all__ = [
    "TABLE_NAMES",
    "Tables",
    "load_table",
    "register_views",
    "csv_scan",
    "excel_scan",
    "population_annotations",
    "hive_id_mapping",
    "phenotypic_measurements",
    "winter_mortality",
    "lookup_map_df",
    "records_to_df",
    "write_metrics_json",
    "read_metrics_json",
    "save_model",
    "load_model",
    "write_predictions",
    "read_predictions",
]
