package graft

import java.io.ByteArrayOutputStream
import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel._
import io.netty.channel.nio.NioIoHandler
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._
import io.netty.util.ReferenceCountUtil

/** Minimal gRPC-over-HTTP/2 test client on netty's frame codec — the
  * consumer side of the public gRPC wire format (POST per call, 5-byte
  * length-prefixed protobuf frames in DATA, grpc-status in trailers).
  * `expectMessages` lets tests take the first N stream messages from a
  * never-completing subscribe and then cancel the stream. */
final class GrpcTestClient(port: Int) extends AutoCloseable {

  private val group = new MultiThreadIoEventLoopGroup(NioIoHandler.newFactory())
  private val ch: Channel = new Bootstrap()
    .group(group)
    .channel(classOf[NioSocketChannel])
    .handler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit =
        c.pipeline().addLast(
          Http2FrameCodecBuilder.forClient().build(),
          // inbound server-initiated streams are not used by gRPC
          new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
    })
    .connect("127.0.0.1", port).syncUninterruptibly().channel()

  final case class Reply(messages: Vector[Array[Byte]], grpcStatus: Int)

  def call(path: String, body: Array[Byte],
      expectMessages: Int = -1, timeoutMs: Long = 30000): Reply = {
    val done = new CompletableFuture[Reply]()
    val handler = new ChannelInboundHandlerAdapter {
      private val buf = new ByteArrayOutputStream()
      private var status = -1
      private def finish(ctx: ChannelHandlerContext): Unit = {
        done.complete(Reply(grpcMessages(buf.toByteArray), status))
        ctx.close()
      }
      override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
        case h: Http2HeadersFrame =>
          val st = h.headers().get("grpc-status")
          if (st != null) status = st.toString.toInt
          if (h.isEndStream) finish(ctx)
        case d: Http2DataFrame =>
          try {
            val arr = new Array[Byte](d.content().readableBytes())
            d.content().readBytes(arr)
            buf.write(arr)
          } finally d.release()
          if (d.isEndStream) finish(ctx)
          else if (expectMessages > 0 && grpcMessages(buf.toByteArray).size >= expectMessages) {
            status = 0 // taking a prefix of a live stream: treat as OK
            finish(ctx)
          }
        case other => ReferenceCountUtil.release(other)
      }
      override def exceptionCaught(ctx: ChannelHandlerContext, cause: Throwable): Unit = {
        done.completeExceptionally(cause); ctx.close()
      }
    }
    val stream = new Http2StreamChannelBootstrap(ch).handler(handler)
      .open().syncUninterruptibly().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST").scheme("http").path(path)
      .authority(s"127.0.0.1:$port")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    stream.write(new DefaultHttp2HeadersFrame(headers))
    stream.writeAndFlush(new DefaultHttp2DataFrame(grpcFrame(body), true))
    try done.get(timeoutMs, TimeUnit.MILLISECONDS)
    finally stream.close()
  }

  override def close(): Unit = {
    ch.close().syncUninterruptibly()
    group.shutdownGracefully(0, 500, TimeUnit.MILLISECONDS)
  }

  private def grpcFrame(m: Array[Byte]): ByteBuf = {
    val b = Unpooled.buffer(5 + m.length)
    b.writeByte(0); b.writeInt(m.length); b.writeBytes(m); b
  }

  private def grpcMessages(b: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    var complete = true
    while (complete && i + 5 <= b.length) {
      val len = ((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
        ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)
      if (i + 5 + len <= b.length) {
        out += java.util.Arrays.copyOfRange(b, i + 5, i + 5 + len)
        i += 5 + len
      } else complete = false // partial trailing frame: wait for more DATA
    }
    out.result()
  }
}
