#!/bin/bash
cd /root/repo
echo "=== DeleteSoak 1000x (exact store) start $(date) ===" > /root/repo/soak1000b.log
GRAFT_SOAK_STORES=exact sbt -batch "Test/runMain graft.DeleteSoak /root/testdata/sf0.1 1000" >> /root/repo/soak1000b.log 2>&1
echo "=== text family 1000x start $(date) ===" >> /root/repo/soak1000b.log
GRAFT_SOAK_ONLY=text sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 1000" >> /root/repo/soak1000b.log 2>&1
echo "=== inc family 300x start $(date) ===" >> /root/repo/soak1000b.log
GRAFT_SOAK_ONLY=inc sbt -batch "Test/runMain graft.Soak /root/testdata/sf0.1 300" >> /root/repo/soak1000b.log 2>&1
echo "=== all done $(date) ===" >> /root/repo/soak1000b.log
