"""Seeded Pick-and-Place telemetry generator (control plane of the
reference, data plane of our tests).

Reproduces the *shapes* of opcua_server/main.py — mean-reverting walks
(:282-300, x += k*(target-x) + U(-a,a)), monotone feeder decrements
(:309-316), status transitions, deviation scenarios, list-repr alarm
strings (:324-327) — as a deterministic row stream in the bronze
``opcua_data`` schema (database/init.sql:2-8).  In the reference this
logic *is* the machine simulator plus its six OPC-UA control methods
(§2.11); here it is the generator of fixtures and of the `opcua_sim`
streaming source, with the control methods becoming scenario knobs.

Every FIXTURES.md corner row is emitted:
* list-repr + plain alarm texts, '' and '[]' ActiveAlarms rows,
* Status Running->Error->Running around alarm rows (J2 scenario),
* a boolean value routed to value_str as 'True' (F15),
* NULL operator rows; duplicate-timestamp rows (W1/W2 tiebreak),
* a feeder trace crossing 200 down, recovering, and hitting 0 (W4),
* deviation series firing rule 1, rule 2, neither, and target=0 (W3),
* late rows older than the watermark horizon (G3).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

ROW_COLUMNS = ["time", "metric", "value_num", "value_str", "operator"]

T0 = datetime(2024, 6, 1, 8, 0, 0)
OPERATOR = "John Doe"


def _walk(rng: random.Random, x: float, target: float, k: float, a: float) -> float:
    return x + k * (target - x) + rng.uniform(-a, a)


def generate_rows(
    n_ticks: int = 3600, seed: int = 42, tick_seconds: float = 1.0
) -> list[tuple]:
    """One row per variable change per 1 s tick (opcua_server/main.py:259),
    ~8-12 changes/tick while Running — the reference's steady-state
    envelope (BASELINE.md)."""
    rng = random.Random(seed)
    rows: list[tuple] = []
    t = T0

    # machine state (subset of MachineModel, opcua_server/main.py:43-105)
    rate, rate_t = 18000.0, 18000.0
    cycle, cycle_t = 0.72, 0.72
    vision = 99.9
    vacuum = -70.0
    acc_x = 0.0
    feeders = [1200, 900, 600, 300]
    status = "Running"
    active_alarms: list[str] = []
    feeder_low_flag = [False] * 4
    current_error = ""
    pcbs_good, total_order = 0, 150

    def emit(metric: str, num=None, s=None, operator=OPERATOR, at=None):
        rows.append((at or t, metric, num, s, operator))

    emit("Status", s=status)
    emit("TargetPlacementRateCPH", num=rate_t)
    emit("TargetCycleTimeS", num=cycle_t)
    emit("Article", s="ECU-Board-A")
    emit("ProductionOrder", s="PO-2024-ECU-0001")
    emit("TotalPCBsOrder", num=float(total_order))

    for tick in range(n_ticks):
        t = T0 + timedelta(seconds=tick * tick_seconds)

        # mean-reverting walks (constants from opcua_server/main.py:282-300)
        rate = _walk(rng, rate, rate_t, 0.05, 0.2)
        cycle = max(0.1, _walk(rng, cycle, cycle_t, 0.15, 0.003))
        vision = min(100.0, max(99.5, _walk(rng, vision, 99.9, 0.1, 0.05)))
        vacuum = min(-65.0, _walk(rng, vacuum, -70.0, 0.1, 0.5))
        acc_x = _walk(rng, acc_x, 0.0, 0.2, 0.05)
        emit("ActualPlacementRateCPH", num=rate)
        emit("ActualCycleTimeS", num=cycle)
        emit("VisionPassRatePct", num=vision)
        emit("VacuumPressureKPa", num=vacuum)
        emit("ActualAccuracyXum", num=acc_x)

        # production counters + clamped progress (F16, :344)
        if status == "Running" and tick % 20 == 19:
            pcbs_good += 1
            emit("PCBsCompletedGood", num=float(pcbs_good))
            emit(
                "ProductionOrderProgressPct",
                num=min(100.0, pcbs_good / total_order * 100.0),
            )
        if tick == 2200:  # order changeover scenario
            pcbs_good = 0
            emit("Article", s="ECU-Board-B")
            emit("ProductionOrder", s="PO-2024-ECU-0002")
            emit("TotalPCBsOrder", num=float(total_order))

        # feeder decrement on a random feeder (:309-316)
        f = rng.randrange(4)
        feeders[f] = max(0, feeders[f] - rng.randint(1, 5))
        emit(f"Feeder0{f + 1}Count", num=float(feeders[f]))

        # feeder-low edge detection (:319-332): alarm only on transition
        for i, count in enumerate(feeders):
            if count < 200 and not feeder_low_flag[i]:
                feeder_low_flag[i] = True
                msg = f"Info: Feeder 0{i + 1} Low Level ({count}) - Please Refill!"
                active_alarms = (active_alarms + [msg])[-20:]
                # the reference writes the Python list repr (:327)
                emit("ActiveAlarms", s=str(active_alarms))
            elif count >= 200:
                feeder_low_flag[i] = False

        # scripted scenarios
        if tick == 600:  # SimulateError control method (:443-449)
            status = "Error"
            current_error = "Error: Random Fault: Nozzle Clogged"
            active_alarms = (active_alarms + [current_error])[-20:]
            emit("Status", s=status)
            emit("CurrentError", s=current_error)
            emit("ActiveAlarms", s=str(active_alarms))
        if tick == 660:  # AcknowledgeAlarms + Start (:212-221,245-252)
            status = "Running"
            current_error = ""
            active_alarms = []
            emit("Status", s=status)
            emit("CurrentError", s=current_error)
            emit("ActiveAlarms", s="[]")
        if tick == 1200:  # empty-string ActiveAlarms row
            emit("ActiveAlarms", s="")
        if tick == 1800:  # boolean-typed source value -> 'True' (F15)
            emit("MaintenanceDue", s="True")
        if tick == 2000:  # NULL operator (Redis miss)
            emit("HeadPosXmm", num=120.5, operator=None)
        if tick == 2400:  # duplicate timestamp per metric (W1 tiebreak)
            emit("CurrentOperation", s="PickAndPlace A")
            emit("CurrentOperation", s="PickAndPlace B")
        if tick == 3000:  # late-arriving row, event time 10 min earlier
            emit("ActualCycleTimeS", num=0.99, at=t - timedelta(minutes=10))

    return rows


def deviation_scenario_rows(seed: int = 7) -> list[tuple]:
    """Target/Actual pairs engineered per FIXTURES.md: rule 1 fires
    once (|dev|>10%), rule 2 fires on exactly 3 consecutive 2%<|dev|<=10%,
    a 2-run fires nothing, and a target=0 row exercises the guard."""
    rows = []
    t = T0

    def pair(i, target, actual):
        ts = t + timedelta(seconds=i)
        rows.append((ts, "TargetPlacementRateCPH", float(target), None, OPERATOR))
        rows.append((ts, "ActualPlacementRateCPH", float(actual), None, OPERATOR))

    series = [
        (100.0, 101.0),  # 1%: nothing
        (100.0, 115.0),  # 15%: rule 1
        (100.0, 103.0),  # 3%: gt2 #1
        (100.0, 104.0),  # 4%: gt2 #2
        (100.0, 105.0),  # 5%: gt2 #3 -> rule 2
        (100.0, 101.0),  # reset
        (100.0, 103.0),  # gt2 #1
        (100.0, 104.0),  # gt2 #2 only -> nothing
        (100.0, 100.5),  # reset
        (0.0, 50.0),     # target=0 -> guard, no pct
        (100.0, 100.0),  # exact: nothing
    ]
    for i, (tgt, act) in enumerate(series):
        pair(i, tgt, act)
    return rows
