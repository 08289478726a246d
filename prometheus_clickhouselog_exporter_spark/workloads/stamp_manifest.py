"""Static driver-stamp priority manifest (round 13: EMPTY — debt is zero).

Evidence basis (judged from CORRECTNESS_r01..r12.json mapped onto
registry positions): the driver stamps the HEAD-50 of the order that
``__spark_entry__.queries()`` returns — r9 took the first 50
never-stamped entries of the r9 ordering, r10 the first 50 of the r10
ordering, r11 took 50 from this manifest, and r12 cleared the final 30
(verified name-by-name in the r12 verdict: cumulative stamped =
registry size for the first time).  ``_registration_order`` in
``__spark_entry__`` ranks never-stamped names by their index here;
never-stamped names NOT listed rank after every manifest entry, so new
work cannot displace old debt.

Round-13 pruning (VERDICT r12, Next round #3): all 30 remaining
entries landed green in CORRECTNESS_r12, so the manifest is pruned to
empty.  The MECHANISM stays: any round-13+ addition is never-stamped
(priority 1) and therefore sorts to the head of ``queries()`` ahead of
every green re-cert until its own driver stamp lands — the manifest
list only needs entries again if a future round leaves debt behind
(i.e. registers more new queries than the driver's 50-stamp window can
absorb alongside them).

Remove names from this list only when their driver stamp lands green.
"""

STAMP_PRIORITY: list[str] = []
