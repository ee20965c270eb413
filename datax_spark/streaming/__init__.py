from datax_spark.streaming.replay_stream import StreamReplay, stream_replay  # noqa: F401
