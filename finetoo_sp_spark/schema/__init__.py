from finetoo_sp_spark.schema.registry import (
    EdgeTypeDef,
    NodeTypeDef,
    PropertyMeta,
    Schema,
    web_graph_schema,
)

__all__ = ["PropertyMeta", "NodeTypeDef", "EdgeTypeDef", "Schema", "web_graph_schema"]
