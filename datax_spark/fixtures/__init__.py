from datax_spark.fixtures.changelog import ChangelogSpec, events_df, write_events

__all__ = ["ChangelogSpec", "events_df", "write_events"]
