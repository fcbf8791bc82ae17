/* Minimal single-process MPI shim.
 *
 * Purpose: build the upstream reference binary (which links against MPI-3)
 * as a single-process executable so we can generate golden outputs and CPU
 * baselines in an environment without an MPI implementation.  Only the calls
 * the reference uses are provided, with trivial single-rank semantics:
 * rank 0 of 1, collectives are memcpys, RMA fetch-and-op operates directly
 * on the window's local memory.  Never used by the TPU framework itself.
 */
#ifndef PRIBLAST_TPU_MPI_SHIM_H
#define PRIBLAST_TPU_MPI_SHIM_H

#include <cstdlib>
#include <cstring>

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef int MPI_Info;
typedef struct {
  int dummy;
} MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_INFO_NULL 0
#define MPI_INT 1
#define MPI_UNSIGNED_CHAR 2
#define MPI_SUM 1
#define MPI_REPLACE 2
#define MPI_LOCK_SHARED 1
#define MPI_LOCK_EXCLUSIVE 2
#define MPI_ANY_SOURCE (-1)
#define MPI_STATUS_IGNORE ((MPI_Status *)0)

struct MPI_Win_s {
  void *base;
};
typedef MPI_Win_s *MPI_Win;

static inline size_t mpi_shim_sizeof(MPI_Datatype t) {
  return t == MPI_INT ? sizeof(int) : sizeof(unsigned char);
}

static inline int MPI_Init(int *, char ***) { return 0; }
static inline int MPI_Finalize() { return 0; }
static inline int MPI_Comm_rank(MPI_Comm, int *rank) {
  *rank = 0;
  return 0;
}
static inline int MPI_Comm_size(MPI_Comm, int *size) {
  *size = 1;
  return 0;
}

static inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
  return 0;
}

static inline int MPI_Scatterv(const void *sendbuf, const int *sendcounts,
                               const int *displs, MPI_Datatype sendtype,
                               void *recvbuf, int recvcount,
                               MPI_Datatype recvtype, int, MPI_Comm) {
  (void)recvcount;
  (void)recvtype;
  if (sendbuf && recvbuf && sendcounts)
    std::memcpy(recvbuf,
                (const char *)sendbuf + displs[0] * mpi_shim_sizeof(sendtype),
                sendcounts[0] * mpi_shim_sizeof(sendtype));
  return 0;
}

static inline int MPI_Gather(const void *sendbuf, int sendcount,
                             MPI_Datatype sendtype, void *recvbuf, int,
                             MPI_Datatype, int, MPI_Comm) {
  if (sendbuf && recvbuf)
    std::memcpy(recvbuf, sendbuf, sendcount * mpi_shim_sizeof(sendtype));
  return 0;
}

static inline int MPI_Gatherv(const void *sendbuf, int sendcount,
                              MPI_Datatype sendtype, void *recvbuf,
                              const int *, const int *displs, MPI_Datatype,
                              int, MPI_Comm) {
  if (sendbuf && recvbuf)
    std::memcpy((char *)recvbuf + (displs ? displs[0] : 0) *
                                      mpi_shim_sizeof(sendtype),
                sendbuf, sendcount * mpi_shim_sizeof(sendtype));
  return 0;
}

static inline int MPI_Alloc_mem(size_t size, MPI_Info, void *baseptr) {
  *(void **)baseptr = std::malloc(size);
  return 0;
}
static inline int MPI_Free_mem(void *base) {
  std::free(base);
  return 0;
}

static inline int MPI_Win_create(void *base, size_t, int, MPI_Info, MPI_Comm,
                                 MPI_Win *win) {
  *win = new MPI_Win_s{base};
  return 0;
}
static inline int MPI_Win_free(MPI_Win *win) {
  delete *win;
  *win = nullptr;
  return 0;
}
static inline int MPI_Win_lock(int, int, int, MPI_Win) { return 0; }
static inline int MPI_Win_unlock(int, MPI_Win) { return 0; }

static inline int MPI_Fetch_and_op(const void *origin, void *result,
                                   MPI_Datatype, int, int target_disp,
                                   MPI_Op op, MPI_Win win) {
  int *target = (int *)win->base + target_disp;
  *(int *)result = *target;
  if (op == MPI_SUM)
    *target += *(const int *)origin;
  else if (op == MPI_REPLACE)
    *target = *(const int *)origin;
  return 0;
}

/* With one process the reference never sends to itself except in the
 * completion-order protocol, which short-circuits at procs == 1. */
static inline int MPI_Send(const void *, int, MPI_Datatype, int, int,
                           MPI_Comm) {
  return 0;
}
static inline int MPI_Recv(void *, int, MPI_Datatype, int, int, MPI_Comm,
                           MPI_Status *) {
  return 0;
}

#endif
