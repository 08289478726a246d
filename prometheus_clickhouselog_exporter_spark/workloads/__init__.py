"""Workload registry: every operator exposed through the driver contract.

Each workload module registers (name → PySpark callable) plus, where the
operator is SQL-expressible, (name → DuckDB oracle SQL). ``__spark_entry__``
re-exports the merged registries. Import order is load-bearing only in that
all modules must be imported for their registrations to run.
"""

from .core import ORACLE, QUERIES, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import relational3  # noqa: F401,E402
from . import relational4  # noqa: F401,E402
from . import relational5  # noqa: F401,E402
from . import relational6  # noqa: F401,E402
from . import relational7  # noqa: F401,E402
from . import relational8  # noqa: F401,E402
from . import relational9  # noqa: F401,E402
from . import relational10  # noqa: F401,E402
from . import relational11  # noqa: F401,E402
from . import relational12  # noqa: F401,E402
from . import relational13  # noqa: F401,E402
from . import relational14  # noqa: F401,E402
from . import relational15  # noqa: F401,E402
from . import relational16  # noqa: F401,E402
from . import relational17  # noqa: F401,E402
from . import relational18  # noqa: F401,E402
from . import relational19  # noqa: F401,E402
from . import relational20  # noqa: F401,E402
from . import relational21  # noqa: F401,E402
from . import relational22  # noqa: F401,E402
from . import relational23  # noqa: F401,E402
from . import relational24  # noqa: F401,E402
from . import relational25  # noqa: F401,E402
from . import relational26  # noqa: F401,E402
from . import relational27  # noqa: F401,E402
from . import relational28  # noqa: F401,E402
from . import relational29  # noqa: F401,E402
from . import relational30  # noqa: F401,E402
from . import relational31  # noqa: F401,E402
from . import relational32  # noqa: F401,E402
from . import relational33  # noqa: F401,E402
from . import relational34  # noqa: F401,E402
from . import clickhouse_parity  # noqa: F401,E402
from . import relational35  # noqa: F401,E402
from . import relational36  # noqa: F401,E402
from . import relational37  # noqa: F401,E402
from . import relational38  # noqa: F401,E402
from . import relational39  # noqa: F401,E402
from . import relational40  # noqa: F401,E402
from . import relational41  # noqa: F401,E402
from . import relational42  # noqa: F401,E402
from . import relational43  # noqa: F401,E402
from . import logpipe  # noqa: F401,E402
from . import llmdata  # noqa: F401,E402
from . import llmdata2  # noqa: F401,E402
from . import llmdata3  # noqa: F401,E402
from . import llmdata4  # noqa: F401,E402
from . import llmdata5  # noqa: F401,E402
from . import llmdata6  # noqa: F401,E402
from . import llmdata7  # noqa: F401,E402
from . import llmdata8  # noqa: F401,E402
from . import llmdata9  # noqa: F401,E402
from . import llmdata10  # noqa: F401,E402
from . import llmdata11  # noqa: F401,E402
from . import llmdata12  # noqa: F401,E402
from . import llmdata13  # noqa: F401,E402
from . import llmdata14  # noqa: F401,E402
from . import llmdata15  # noqa: F401,E402
from . import llmdata16  # noqa: F401,E402
from . import llmdata17  # noqa: F401,E402
from . import llmdata18  # noqa: F401,E402
from . import llmdata19  # noqa: F401,E402
from . import llmdata20  # noqa: F401,E402
from . import llmdata21  # noqa: F401,E402
from . import llmdata22  # noqa: F401,E402
from . import llmdata23  # noqa: F401,E402
from . import llmdata24  # noqa: F401,E402
from . import llmdata25  # noqa: F401,E402
from . import llmdata26  # noqa: F401,E402
from . import llmdata27  # noqa: F401,E402
from . import llmdata28  # noqa: F401,E402
from . import relational44  # noqa: F401,E402
from . import relational45  # noqa: F401,E402
from . import llmdata29  # noqa: F401,E402
from . import relational46  # noqa: F401,E402
from . import llmdata30  # noqa: F401,E402
from . import relational47  # noqa: F401,E402
from . import llmdata31  # noqa: F401,E402
from . import relational48  # noqa: F401,E402
from . import llmdata32  # noqa: F401,E402
from . import relational49  # noqa: F401,E402
from . import llmdata33  # noqa: F401,E402
from . import relational50  # noqa: F401,E402
from . import relational51  # noqa: F401,E402
from . import relational52  # noqa: F401,E402
from . import llmdata34  # noqa: F401,E402
from . import relational53  # noqa: F401,E402
from . import llmdata35  # noqa: F401,E402
from . import relational54  # noqa: F401,E402
from . import relational55  # noqa: F401,E402
from . import llmdata36  # noqa: F401,E402
from . import relational56  # noqa: F401,E402
from . import relational57  # noqa: F401,E402
from . import relational58  # noqa: F401,E402
from . import relational59  # noqa: F401,E402
from . import relational60  # noqa: F401,E402
from . import relational61  # noqa: F401,E402
from . import relational62  # noqa: F401,E402
from . import relational63  # noqa: F401,E402
from . import diagnostics  # noqa: F401,E402
from . import pipeline_ops  # noqa: F401,E402
from . import pipeline_ops2  # noqa: F401,E402
from . import pipeline_ops4  # noqa: F401,E402
from . import pipeline_ops5  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLE", "query"]
