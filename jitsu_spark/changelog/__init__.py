from jitsu_spark.changelog.generator import CHANGELOG_SCHEMA, changelog_df, evolving_phases
from jitsu_spark.changelog.oracle import assert_matches_oracle, dict_replay

__all__ = [
    "CHANGELOG_SCHEMA",
    "changelog_df",
    "evolving_phases",
    "dict_replay",
    "assert_matches_oracle",
]
