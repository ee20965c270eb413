from datax_spark.streaming.change_source import (  # noqa: F401
    LakeChangesDataSource,
    stream_changes,
)
from datax_spark.streaming.replay_stream import StreamReplay, stream_replay  # noqa: F401
