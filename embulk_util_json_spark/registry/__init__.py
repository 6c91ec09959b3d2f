"""Driver registry package: the query/oracle definitions behind
``__spark_entry__.queries()`` / ``oracle_sql()``, split by domain.
"""
