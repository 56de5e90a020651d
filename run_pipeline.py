#!/usr/bin/env python
"""Thin spark-submit launcher (north_rule: ships as --py-files modules).

    python -m zipfile -c prclz_spark.zip prclz_spark
    spark-submit --master <cluster> --py-files prclz_spark.zip \
        run_pipeline.py --store <warehouse-uri> --n <rows>

All logic lives in the shipped package; this file exists because
spark-submit takes a script, not a module path.
"""

from prclz_spark.pipeline import main

if __name__ == "__main__":
    main()
