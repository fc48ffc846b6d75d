from .transcripts import transcripts_pandas, transcripts_spark  # noqa: F401
from .session import get_spark  # noqa: F401
from .io import compact_table, read_table, write_bucketed, write_table  # noqa: F401
