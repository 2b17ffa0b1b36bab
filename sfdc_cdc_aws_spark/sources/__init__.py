from sfdc_cdc_aws_spark.sources.tables import load_table, TABLES  # noqa: F401
