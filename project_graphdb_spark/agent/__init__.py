from project_graphdb_spark.agent.state import AgentState, new_state  # noqa: F401
from project_graphdb_spark.agent.workflow import (  # noqa: F401
    NO_RESULTS_SENTINEL,
    TemplatePlanner,
    run_agent_workflow,
)
from project_graphdb_spark.agent.rca import stream_rca  # noqa: F401
