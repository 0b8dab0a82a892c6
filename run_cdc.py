#!/usr/bin/env python
"""spark-submit launcher for the CDC apply pipeline.

    cd <repo> && zip -qr /tmp/nifi_spark.zip nifi_spark
    spark-submit --py-files /tmp/nifi_spark.zip run_cdc.py \
        --feed-dir /data/change_feed --table /data/conversations \
        --checkpoint /data/ckpt --available-now

Under spark-submit the session respects the cluster's configured
`spark.master`; only standalone local runs force `local[N]`
(see nifi_spark.session.get_spark).
"""

from nifi_spark.streaming.job import _cli

if __name__ == "__main__":
    _cli()
