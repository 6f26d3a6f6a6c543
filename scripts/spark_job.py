#!/usr/bin/env python
"""spark-submit entry script — delegates to the packaged CLI.

    zip -r /tmp/d2es.zip dynamo2es_lambda_spark
    spark-submit --py-files /tmp/d2es.zip scripts/spark_job.py build \
        --input /data/corpus --store /data/index
"""

import sys

from dynamo2es_lambda_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
